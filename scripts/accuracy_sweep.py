"""8-shard online-accuracy experiment harness (VERDICT round-1 item 4).

Round-1 baseline: 14-21% rel-L2 at 8 shards on the 48x4x4 beam (vs 1.0-1.3%
at the reference's 2 shards). Hypothesis: after warm-up the predictor's
history is purely its own previous predictions (Online_predictor.py:298-301
— the overwrite is recorded back into the history), i.e. the online phase
is ~650 coarse steps of open-loop autoregression, while the reference
training objective only optimizes 20-step rollouts. ``rollout_windows``
trains on chained windows (output feeds the next encoder input — the exact
online regime); this harness measures rel-L2 vs W and other levers.

Stages 1-2 (solve + trace extraction) run once; each variant re-runs
stages 3-5 against the shared artifacts. Writes runs/accuracy/summary.json.

Usage: python scripts/accuracy_sweep.py [--steps N] [--epochs N]
       [--parts P] [--cells nx ny nz] [--out DIR]
       [--variants name=W,name=W ...]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/savtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--cells", type=int, nargs=3, default=(48, 4, 4))
    ap.add_argument("--out", type=str, default="runs/accuracy")
    ap.add_argument(
        "--variants", type=str, default="W1=1,W3=3,W6=6",
        help="comma-separated name=rollout_windows",
    )
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.pipeline import (
        data_prepare,
        model_training,
        online_predictor,
        plotter,
        shared_extraction,
    )
    from savtpu.pipeline.common import build_context

    out = Path(args.out)
    base = Config()
    nx, ny, nz = args.cells
    base.beam_cells = (nx, ny, nz)
    base.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    base.workdir = str(out / "Results")
    base.partition.n_parts = args.parts
    base.solver.num_steps = args.steps
    if args.epochs:
        base.surrogate.num_epochs = args.epochs

    t0 = time.time()
    ctx = build_context(base, dtype=jnp.float32)
    data_prepare.run(base, ctx=ctx)
    shared_extraction.run(base)
    t_data = time.time() - t0
    print(f"[accuracy] stages 1-2: {t_data:.1f}s", flush=True)

    results = {"config": {"cells": list(args.cells), "parts": args.parts,
                          "steps": args.steps,
                          "device": str(jax.devices()[0])},
               "stage12_seconds": round(t_data, 1),
               "variants": {}}
    for spec in args.variants.split(","):
        name, w = spec.split("=")
        cfg = copy.deepcopy(base)
        cfg.model_dir = str(out / f"models_{name}")
        cfg.surrogate.rollout_windows = int(w)
        if args.epochs:
            cfg.surrogate.num_epochs = args.epochs

        t1 = time.time()
        model_training.run(cfg, verbose=False)
        t_train = time.time() - t1
        t1 = time.time()
        online_predictor.run(cfg, ctx=ctx, verbose=False)
        t_online = time.time() - t1
        metrics = plotter.run(cfg, verbose=False)
        rels = [v for k, v in metrics.items() if k.endswith("rel_l2_nonshared")]
        results["variants"][name] = {
            "rollout_windows": int(w),
            "train_seconds": round(t_train, 1),
            "online_seconds": round(t_online, 1),
            "rel_l2_per_rank": [round(v, 5) for v in rels],
            "rel_l2_max": round(max(rels), 5),
            "rel_l2_mean": round(sum(rels) / len(rels), 5),
        }
        print(f"[accuracy] {name}: W={w} train={t_train:.0f}s "
              f"online={t_online:.0f}s max relL2="
              f"{max(rels)*100:.2f}%", flush=True)
        out.mkdir(parents=True, exist_ok=True)
        (out / "summary.json").write_text(json.dumps(results, indent=2))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
