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

if "--f64" in sys.argv:
    # f64 method-accuracy mode: the f32 trajectory rel-L2 has an intrinsic
    # ~5-10% noise floor over 1e5 steps (docs/PRECISION.md) that masks the
    # surrogate's real error; f64 on CPU removes it.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))
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
    ap.add_argument("--f64", action="store_true",
                    help="float64 on CPU (method-accuracy mode)")
    ap.add_argument("--compensated", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="double-word f32 state roll (TPU method-accuracy "
                         "mode, docs/PRECISION.md); default None = config "
                         "auto (on for f32)")
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
    # all variants train into the shared store (the ctx used by stage 4);
    # each variant's metrics are collected before the next overwrites it
    base.model_dir = str(out / "models")
    base.partition.n_parts = args.parts
    base.solver.num_steps = args.steps
    base.solver.compensated = args.compensated
    # coarsen storage as much as the schedule allows (must divide both
    # num_steps and filter_size): training windows are bit-identical
    # (effective_filter) and the trajectory transfer off the chip shrinks
    # by that factor; the shared-DOF history the online stage needs stays
    # full-resolution in memory.
    import math

    base.solver.save_every = math.gcd(
        args.steps, base.surrogate.filter_size
    )
    if args.epochs:
        base.surrogate.num_epochs = args.epochs

    t0 = time.time()
    ctx = build_context(
        base, dtype=jnp.float64 if args.f64 else jnp.float32
    )
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
        # name=W[:c0][:hN]  (c0 = consensus off, hN = hidden size N)
        name, opts = spec.split("=")
        opts = opts.split(":")
        cfg = copy.deepcopy(base)
        cfg.surrogate.rollout_windows = int(opts[0])
        w = opts[0]
        for o in opts[1:]:
            if o == "c0":
                cfg.surrogate.pred_consensus = False
            elif o == "c1":
                cfg.surrogate.pred_consensus = True
            elif o.startswith("h"):
                cfg.surrogate.hidden_size = int(o[1:])
            else:
                raise ValueError(f"unknown variant option {o!r}")
        if args.epochs:
            cfg.surrogate.num_epochs = args.epochs

        # the shared ctx's artifact store carries the BASE run_tag; a
        # variant that changes a tag field (e.g. hidden_size) trains into
        # a different Distributed_save dir, so rebind the store or stage 4
        # silently reloads the previous variant's models
        from savtpu.io.artifacts import ArtifactStore

        ctx.store = ArtifactStore(
            cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag()
        )
        ctx.cfg = cfg

        try:
            t1 = time.time()
            model_training.run(cfg, verbose=False)
            t_train = time.time() - t1
            t1 = time.time()
            online_predictor.run(cfg, ctx=ctx, verbose=False)
            t_online = time.time() - t1
            metrics = plotter.run(cfg, verbose=False)
        except Exception as e:  # keep sweeping on per-variant failure
            results["variants"][name] = {
                "error": f"{type(e).__name__}: {e}"
            }
            print(f"[accuracy] {name}: FAILED {type(e).__name__}: {e}",
                  flush=True)
            out.mkdir(parents=True, exist_ok=True)
            (out / "summary.json").write_text(json.dumps(results, indent=2))
            continue
        rels = [v for k, v in metrics.items()
                if k.startswith("rank_") and k.endswith("rel_l2_nonshared")]
        results["variants"][name] = {
            "rollout_windows": int(w),
            "pred_consensus": cfg.surrogate.pred_consensus,
            "hidden_size": cfg.surrogate.hidden_size,
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
