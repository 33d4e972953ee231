"""Full reference-scale pipeline validation.

Runs the complete 5-stage pipeline at the reference benchmark
configuration (BASELINE.md): reference cantilever mesh (110 nodes), 2
parts, 1e5 explicit steps, n_p=n_f=20, n_s=150, n_ts=0.5, nH=50, nB=10,
Adam 5e-4 with 0.998 decay for 3450 epochs — then reports the
truth-vs-predicted rel-L2 metrics. float64 on CPU (the parity dtype).

Stage 3 (surrogate training) runs in a SUBPROCESS on the default
accelerator in float32 — the reference itself trains in float32 torch
(optionally on GPU, Model_training.py:16), so accelerator training is the
parity-faithful fast path; the solver stages stay float64 CPU. Pass
--train-cpu to force stage 3 onto the CPU too.

Usage: python scripts/full_reference_run.py [--epochs N] [--steps N]
Writes artifacts under runs/full_reference/ and a summary JSON.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

if "--tpu" not in sys.argv:
    # parity dtype: float64 on CPU. --tpu instead runs everything on the
    # accelerator in float32 with compensated integration (f64-class
    # trajectories without f64, docs/PRECISION.md).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--out", type=str, default="runs/full_reference")
    ap.add_argument("--train-cpu", action="store_true",
                    help="run stage 3 in-process on CPU instead of the "
                         "accelerator subprocess")
    ap.add_argument("--tpu", action="store_true",
                    help="run the whole pipeline on the accelerator in "
                         "f32 + compensated integration")
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.pipeline import run_all

    out = Path(args.out)
    cfg = Config()
    ref_mesh = "/root/reference/Mesh_info/beam_coarse.vtk"
    if Path(ref_mesh).exists():
        cfg.mesh_path = ref_mesh
    cfg.workdir = str(out / "Results")
    cfg.model_dir = str(out / "Distributed_save")
    cfg.partition.n_parts = 2
    cfg.solver.num_steps = args.steps
    if args.tpu:
        import jax.numpy as jnp
    if args.epochs:
        cfg.surrogate.num_epochs = args.epochs

    stamps = {"start": time.time()}
    from savtpu.pipeline import (
        data_prepare,
        model_training,
        online_predictor,
        plotter,
        shared_extraction,
    )
    from savtpu.pipeline.common import build_context

    ctx = build_context(
        cfg, dtype=jnp.float32 if args.tpu else None
    ) if args.tpu else build_context(cfg)
    stamps["setup_done"] = time.time()
    data_prepare.run(cfg, ctx=ctx)
    stamps["stage1_done"] = time.time()
    shared_extraction.run(cfg)
    stamps["stage2_done"] = time.time()
    if args.train_cpu or args.tpu:
        model_training.run(cfg)
    else:
        # accelerator training subprocess (f32, like the reference's
        # torch); JAX_PLATFORMS is unset so the default backend is used
        import os
        import subprocess

        cfg_path = out / "train_cfg.json"
        out.mkdir(parents=True, exist_ok=True)
        cfg.to_json(cfg_path)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        r = subprocess.run(
            [sys.executable, "-m", "savtpu.pipeline.model_training",
             "--config", str(cfg_path)],
            cwd=str(Path(__file__).resolve().parents[1]), env=env,
        )
        if r.returncode != 0:
            raise RuntimeError("accelerator training subprocess failed")
    stamps["stage3_done"] = time.time()
    online_predictor.run(cfg, ctx=ctx)
    stamps["stage4_done"] = time.time()
    metrics = plotter.run(cfg)
    stamps["stage5_done"] = time.time()

    summary = {
        "config": {
            "steps": cfg.solver.num_steps,
            "epochs": cfg.surrogate.epochs,
            "n_parts": cfg.partition.n_parts,
            "device": str(jax.devices()[0]),
            "dtype": "float32+compensated" if args.tpu else "float64",
        },
        "timings_s": {
            "setup": stamps["setup_done"] - stamps["start"],
            "stage1_solve": stamps["stage1_done"] - stamps["setup_done"],
            "stage2_extract": stamps["stage2_done"] - stamps["stage1_done"],
            "stage3_train": stamps["stage3_done"] - stamps["stage2_done"],
            "stage4_online": stamps["stage4_done"] - stamps["stage3_done"],
            "stage5_plot": stamps["stage5_done"] - stamps["stage4_done"],
        },
        "metrics": metrics,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
