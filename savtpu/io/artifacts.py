"""Artifact contract: every file the reference pipeline produces, same
layout (SURVEY.md §2.7 artifact map), so inter-stage communication stays
filesystem-based and each stage is independently restartable:

    {workdir}/Rankwised_Data/Rank=<r>_local_nodes.csv      (Data_prepare.py:117)
    {workdir}/Shared_Data/Rank=<r>_shared.csv, Global_shared.csv   (:116,124)
    {workdir}/Rankwised_Element/Rank=<r>_elements.csv      (:118)
    {workdir}/Static/steady_distributed.vtk                (:168)
    {workdir}/Dynamics/Local-rank-<r>.hdf5                 (:242-246)
    {workdir}/sol_on_shared/rank=<r>-shared_dof.hdf5       (Shared_extraction.py:38)
    {model_dir}/Rank-<r>/<tag>/{model.msgpack, scaling.json,
        train_loss.csv, test_loss.csv, train_acc_r2.csv, test_acc_r2.csv,
        train_acc_rel.csv, test_acc_rel.csv, train-test-loss-acc.png}
                                                           (Model_training.py:27-29,143-180)
    {workdir}/Dynamics/Modeled_Local-rank-<r>.hdf5         (Online_predictor.py:321-324)

HDF5 via h5py (gzip, dataset 'Displacement' of shape (3*n_local, T) like
the reference); transparent .npz fallback when h5py is absent. Model
weights as flax msgpack + a JSON architecture/scaling sidecar (the
reference hardcodes the architecture a third time in call_model,
DNN_prediction.py:21-24 — the sidecar removes that drift hazard).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

import numpy as np

try:
    import h5py

    _HAS_H5PY = True
except ImportError:  # pragma: no cover
    _HAS_H5PY = False


def save_displacement(path: str | Path, data: np.ndarray) -> Path:
    """Save a (3*n_local, T) trajectory under dataset 'Displacement'."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if _HAS_H5PY:
        with h5py.File(path, "w") as hf:
            hf.create_dataset(
                "Displacement", data=np.asarray(data), compression="gzip"
            )
    else:
        path = path.with_suffix(".npz")
        np.savez_compressed(path, Displacement=np.asarray(data))
    return path


def load_displacement(path: str | Path) -> np.ndarray:
    path = Path(path)
    if path.exists() and _HAS_H5PY and path.suffix != ".npz":
        with h5py.File(path, "r") as hf:
            return np.array(hf["Displacement"])
    npz = path.with_suffix(".npz")
    if npz.exists():
        return np.load(npz)["Displacement"]
    with h5py.File(path, "r") as hf:  # raise the natural error
        return np.array(hf["Displacement"])


def save_params(path: str | Path, params, meta: Optional[Dict] = None) -> None:
    """Serialize a parameter pytree (flax msgpack) + JSON sidecar."""
    from flax import serialization

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(serialization.to_bytes(params))
    if meta is not None:
        path.with_suffix(".json").write_text(json.dumps(meta, indent=2))


def load_params(path: str | Path, template):
    from flax import serialization

    return serialization.from_bytes(template, Path(path).read_bytes())


def load_params_meta(path: str | Path) -> Dict:
    return json.loads(Path(path).with_suffix(".json").read_text())


class ArtifactStore:
    """Path book-keeping for one pipeline run."""

    def __init__(self, workdir, model_dir, tag: str):
        self.workdir = Path(workdir)
        self.model_dir = Path(model_dir)
        self.tag = tag

    # ---- stage 1 ----
    def local_nodes_csv(self, r: int) -> Path:
        return self.workdir / "Rankwised_Data" / f"Rank={r}_local_nodes.csv"

    def shared_csv(self, r: int) -> Path:
        return self.workdir / "Shared_Data" / f"Rank={r}_shared.csv"

    def global_shared_csv(self) -> Path:
        return self.workdir / "Shared_Data" / "Global_shared.csv"

    def elements_csv(self, r: int) -> Path:
        return self.workdir / "Rankwised_Element" / f"Rank={r}_elements.csv"

    def steady_vtk(self) -> Path:
        return self.workdir / "Static" / "steady_distributed.vtk"

    def dynamics_h5(self, r: int) -> Path:
        return self.workdir / "Dynamics" / f"Local-rank-{r}.hdf5"

    # ---- stage 2 ----
    def shared_dof_h5(self, r: int) -> Path:
        return self.workdir / "sol_on_shared" / f"rank={r}-shared_dof.hdf5"

    # ---- stage 3 ----
    def model_run_dir(self, r: int) -> Path:
        return self.model_dir / f"Rank-{r}" / self.tag

    def model_file(self, r: int) -> Path:
        return self.model_run_dir(r) / "model.msgpack"

    # ---- stage 4 ----
    def modeled_h5(self, r: int) -> Path:
        return self.workdir / "Dynamics" / f"Modeled_Local-rank-{r}.hdf5"

    # ---- mid-run checkpoints (savtpu extension; utils/checkpoint.py) ----
    def ckpt_dir(self, stage: str) -> Path:
        return self.workdir / "Checkpoints" / stage

    # ---- helpers ----
    def save_int_csv(self, path: Path, arr) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        np.savetxt(path, np.asarray(arr, dtype=np.int64), delimiter=",", fmt="%d")

    @staticmethod
    def load_int_csv(path: Path) -> np.ndarray:
        return np.atleast_1d(
            np.genfromtxt(path, delimiter=",").astype(np.int64)
        )

    def save_training_curves(self, r: int, hist: Dict) -> None:
        """CSV + PNG training curves (Model_training.py:143-175)."""
        d = self.model_run_dir(r)
        d.mkdir(parents=True, exist_ok=True)
        names = {
            "train_loss": "train_loss.csv",
            "val_loss": "test_loss.csv",
            "train_r2": "train_acc_r2.csv",
            "val_r2": "test_acc_r2.csv",
            "train_rel": "train_acc_rel.csv",
            "val_rel": "test_acc_rel.csv",
        }
        for key, fname in names.items():
            if hist.get(key):
                np.savetxt(d / fname, np.asarray(hist[key]), delimiter=",")
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            fig = plt.figure(figsize=(16, 8))
            plt.subplot(1, 2, 1)
            plt.semilogy(hist["train_loss"], label="train")
            if hist.get("val_loss"):
                plt.semilogy(hist["val_loss"], label="test")
            plt.xlabel("epoch")
            plt.legend()
            plt.subplot(1, 2, 2)
            for key, lbl in [
                ("train_r2", "train:R2"),
                ("val_r2", "test:R2"),
                ("train_rel", "train:Rel"),
                ("val_rel", "test:Rel"),
            ]:
                if hist.get(key):
                    plt.plot(hist[key], label=lbl)
            plt.xlabel("epoch")
            plt.legend()
            fig.savefig(d / "train-test-loss-acc.png")
            plt.close(fig)
        except Exception:
            pass
