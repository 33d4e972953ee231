"""Diagnose the 8-shard online error: where does it come from?

Decomposes the hybrid run's error into:
  (a) teacher-forced model error — predict each 3000-step block from the
      TRUE history (the error floor of the surrogate itself);
  (b) closed-loop error — the actual hybrid run's shared-DOF and
      non-shared-DOF error per block (feedback compounding on top of (a)).

Reads the artifacts of a prior accuracy_sweep run. CPU-only.

Usage: python scripts/accuracy_diagnose.py --dir runs/accuracy_consensus
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, default="runs/accuracy_consensus")
    ap.add_argument("--parts", type=int, default=8)
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.io.artifacts import ArtifactStore, load_displacement
    from savtpu.io.artifacts import load_params, load_params_meta
    from savtpu.models import init_seq2seq
    from savtpu.models.predictor import phase_interleaved_predict
    from savtpu.pipeline.shared_extraction import shared_dof_indices

    out = Path(args.dir)
    cfg = Config()
    cfg.workdir = str(out / "Results")
    mdir = out / "models"
    cfg.model_dir = str(mdir if mdir.exists() else out / "Distributed_save")
    sur = cfg.surrogate
    store = ArtifactStore(cfg.workdir, cfg.model_dir, sur.run_tag())

    # stored traces are strided by save_every; work in stored-row units
    meta0 = load_params_meta(store.model_file(0))
    n_p, n_f, n_s = sur.n_past, sur.n_future, sur.filter_size

    report = {}
    for r in range(args.parts):
        local_nodes = store.load_int_csv(store.local_nodes_csv(r))
        shared = store.load_int_csv(store.shared_csv(r))
        rows = shared_dof_indices(local_nodes, shared)
        exact = load_displacement(store.dynamics_h5(r))      # (3n, Tst)
        modeled = load_displacement(store.modeled_h5(r))
        se = 100_000 // exact.shape[1]
        ns_rows = n_s // se                                   # stride in rows
        true_sh = exact[rows, :].T                            # (Tst, D)
        mod_sh = modeled[rows, :].T
        D = true_sh.shape[1]

        meta = load_params_meta(store.model_file(r))
        template = init_seq2seq(
            jax.random.PRNGKey(0), meta["input_size"], meta["hidden_size"],
            meta["num_layers_encoder"], meta["bidirectional"],
            dtype=jnp.float32,
        )
        params = load_params(store.model_file(r), template)
        smax, smin = meta["scale_max"], meta["scale_min"]
        pad = meta["input_size"] - D

        block_rows = (n_f * n_s) // se                        # 3000 steps
        i_cri_row = (n_p * n_s) // se
        Trows = true_sh.shape[0]
        tf_err, cl_err = [], []
        i = i_cri_row
        while i + block_rows <= Trows:
            hist = true_sh[i - n_p * ns_rows : i]             # true history
            if pad:
                hist = np.pad(hist, ((0, 0), (0, pad)))
            blockpred = np.asarray(
                phase_interleaved_predict(
                    params, jnp.asarray(hist, jnp.float32),
                    smax, smin, n_p, n_f, ns_rows,
                )
            )[:, :D]                                          # (block_rows, D)
            truth = true_sh[i : i + block_rows]
            nt = max(np.linalg.norm(truth), 1e-30)
            tf_err.append(float(np.linalg.norm(blockpred - truth) / nt))
            cl_err.append(
                float(
                    np.linalg.norm(mod_sh[i : i + block_rows] - truth) / nt
                )
            )
            i += block_rows

        # non-shared closed-loop error per block
        keep = np.ones(exact.shape[0], bool)
        keep[rows] = False
        ns_err = []
        i = i_cri_row
        while i + block_rows <= Trows:
            tr = exact[keep, i : i + block_rows]
            ns_err.append(
                float(
                    np.linalg.norm(modeled[keep, i : i + block_rows] - tr)
                    / max(np.linalg.norm(tr), 1e-30)
                )
            )
            i += block_rows

        report[r] = {
            "D": D,
            "teacher_forced_relL2_per_block": [round(x, 4) for x in tf_err],
            "closed_loop_shared_relL2_per_block": [
                round(x, 4) for x in cl_err
            ],
            "closed_loop_nonshared_relL2_per_block": [
                round(x, 4) for x in ns_err
            ],
        }
        print(
            f"rank {r}: D={D} | teacher-forced mean "
            f"{np.mean(tf_err)*100:.2f}% max {np.max(tf_err)*100:.2f}% | "
            f"closed-loop shared mean {np.mean(cl_err)*100:.2f}% "
            f"final {cl_err[-1]*100:.2f}% | nonshared final "
            f"{ns_err[-1]*100:.2f}%",
            flush=True,
        )

    (out / "diagnosis.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
