"""Re-run stages 4+5 against an existing scale_demo artifact dir with
different online-prediction knobs (pred_smooth / consensus) — stages 1-3
(solve, extraction, training) are reused as-is.

Usage: python scripts/rerun_online.py --dir runs/scale_96_200k
       --cells 96 8 8 --parts 16 --steps 200000 [--smooth 150]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, required=True)
    ap.add_argument("--cells", type=int, nargs=3, default=(96, 8, 8))
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--smooth", type=int, default=0)
    ap.add_argument("--resync", type=int, default=0,
                    help="one exchanged block every N predicted blocks")
    ap.add_argument("--filter-size", type=int, default=None,
                    help="override surrogate.filter_size (n_s); retrains "
                         "stage 3 (use to keep n_s*dt constant across "
                         "mesh refinements)")
    ap.add_argument("--n-past", type=int, default=None)
    ap.add_argument("--n-future", type=int, default=None)
    ap.add_argument("--hidden", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None,
                    help="override surrogate.num_epochs (retrains stage 3)")
    ap.add_argument("--epoch-chunk", type=int, default=None,
                    help="epochs per training dispatch (lower for large "
                         "window counts; remote watchdog)")
    ap.add_argument("--no-consensus", action="store_true")
    ap.add_argument("--anchor", action="store_true",
                    help="per-block exchanged anchoring (pred_anchor)")
    ap.add_argument("--modal", type=int, default=0,
                    help="train surrogates on k PCA mode coefficients "
                         "(modal_dim; retrains stage 3)")
    ap.add_argument("--arch", type=str, default=None,
                    choices=("lstm", "linear", "expfit", "hybrid"),
                    help="surrogate architecture (retrains stage 3)")
    ap.add_argument("--order", type=int, default=None,
                    help="expfit_order for --arch expfit")
    ap.add_argument("--ridge", type=float, default=None,
                    help="ridge_lambda for --arch linear")
    ap.add_argument("--phases", type=int, default=None,
                    help="window_phases: training windows from this many "
                         "coarse-grid phase offsets (retrains stage 3)")
    ap.add_argument("--rollout", type=int, default=0,
                    help="rollout_windows for training (retrains stage 3)")
    ap.add_argument("--ensemble", type=int, default=None,
                    help="surrogate.ensemble: average E independently "
                         "seeded members online (retrains stage 3)")
    ap.add_argument("--cutoff", type=float, default=None,
                    help="surrogate.cut_off override (retrains stage 3). "
                         "cut_off=1.0 is a DIAGNOSTIC upper bound: it "
                         "trains on the full trace being predicted, "
                         "separating extrapolation/distribution-shift "
                         "error from in-distribution autoregressive drift")
    ap.add_argument("--input-noise", type=float, default=None,
                    help="surrogate.input_noise (retrains stage 3)")
    ap.add_argument("--seed", type=int, default=None,
                    help="surrogate.seed (retrains stage 3; for retrain-"
                         "spread estimates)")
    ap.add_argument("--compensated", action="store_true", default=True)
    ap.add_argument("--fint", type=str, default=None,
                    choices=("auto", "dense", "banded", "ell", "ebe",
                             "pallas", "stencil"),
                    help="solver.fint_mode for the online rerun "
                         "(stencil needs --pmethod box; trajectories "
                         "are mode-independent so artifacts from any "
                         "stage-1 mode are valid)")
    ap.add_argument("--pmethod", type=str, default=None,
                    choices=("rcb", "graph", "slab", "box"),
                    help="partition method -- MUST match the stage-1 run "
                         "that produced --dir's artifacts")
    ap.add_argument("--material", type=str, default=None,
                    choices=("linear", "neo_hookean"),
                    help="material.model -- MUST match the stage-1 run")
    ap.add_argument("--hist-dtype", type=str, default=None,
                    help="stage-4 history carry dtype (e.g. bfloat16); "
                         "halves the (P, W, S3) device carry at 256 "
                         "parts (SurrogateConfig.hist_dtype)")
    ap.add_argument("--skip-retrain", action="store_true",
                    help="reuse the existing Distributed_save models even "
                         "when surrogate knobs are passed (the knobs must "
                         "match the models on disk — used for timing "
                         "reruns of stage 4 alone)")
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.pipeline import model_training, online_predictor, plotter
    from savtpu.pipeline.common import build_context

    out = Path(args.dir)
    cfg = Config()
    nx, ny, nz = args.cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    cfg.workdir = str(out / "Results")
    cfg.model_dir = str(out / "Distributed_save")
    cfg.partition.n_parts = args.parts
    cfg.solver.num_steps = args.steps
    cfg.solver.compensated = args.compensated
    cfg.solver.save_every = math.gcd(args.steps, cfg.surrogate.filter_size)
    cfg.surrogate.stacked = True
    cfg.surrogate.pred_smooth = args.smooth
    cfg.surrogate.resync_blocks = args.resync
    cfg.surrogate.pred_consensus = not args.no_consensus
    cfg.surrogate.pred_anchor = args.anchor
    if args.fint:
        cfg.solver.fint_mode = args.fint
    if args.pmethod:
        cfg.partition.method = args.pmethod
    if args.material:
        cfg.material.model = args.material
    retrain = False
    if args.modal:
        cfg.surrogate.modal_dim = args.modal
        retrain = True
    if args.arch:
        cfg.surrogate.arch = args.arch
        retrain = True
    if args.ridge is not None:
        cfg.surrogate.ridge_lambda = args.ridge
        retrain = True
    if args.order is not None:
        cfg.surrogate.expfit_order = args.order
        retrain = True
    if args.phases:
        cfg.surrogate.window_phases = args.phases
        retrain = True
    if args.rollout:
        cfg.surrogate.rollout_windows = args.rollout
        retrain = True
    if args.filter_size:
        cfg.surrogate.filter_size = args.filter_size
        retrain = True
    if args.n_past:
        cfg.surrogate.n_past = args.n_past
        retrain = True
    if args.n_future:
        cfg.surrogate.n_future = args.n_future
        retrain = True
    if args.hidden:
        cfg.surrogate.hidden_size = args.hidden
        retrain = True
    if args.epochs:
        cfg.surrogate.num_epochs = args.epochs
        retrain = True
    if args.ensemble:
        cfg.surrogate.ensemble = args.ensemble
        retrain = True
    if args.cutoff is not None:
        cfg.surrogate.cut_off = args.cutoff
        retrain = True
    if args.input_noise is not None:
        cfg.surrogate.input_noise = args.input_noise
        retrain = True
    if args.seed is not None:
        cfg.surrogate.seed = args.seed
        retrain = True
    if args.hist_dtype:
        cfg.surrogate.hist_dtype = args.hist_dtype
    if args.epoch_chunk:
        cfg.surrogate.epoch_chunk = args.epoch_chunk
    cfg.solver.save_every = math.gcd(args.steps, cfg.surrogate.filter_size)

    ctx = build_context(cfg, dtype=jnp.float32)
    if args.skip_retrain:
        retrain = False
    if retrain:
        t0 = time.time()
        model_training.run(cfg, verbose=False)
        print(f"[rerun] stage3 retrain {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    online_predictor.run(cfg, ctx=ctx)
    t_online = time.time() - t0
    metrics = plotter.run(cfg, verbose=False)
    rels = [v for k, v in metrics.items()
            if k.startswith("rank_") and k.endswith("rel_l2_nonshared")]
    # embed the stage-4 wall breakdown from the run's own metrics.jsonl
    # (VERDICT r4 #3: every quoted perf number must be a committed
    # artifact field — warmup/first-group/loop/fetch/write were
    # instrumented but never propagated into these summaries)
    stage4 = {}
    mpath = Path(cfg.workdir) / "metrics.jsonl"
    if mpath.exists():
        for line in mpath.read_text().splitlines():
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("event") == "stage4_online":
                stage4 = {
                    k: rec[k]
                    for k in ("seconds", "steps_per_sec", "warmup_s",
                              "first_group_s", "fetch_s", "write_s",
                              "comm_free_fraction", "blocks")
                    if k in rec
                }  # keep the LAST record (this rerun's)
    summary = {
        "smooth": args.smooth,
        "anchor": args.anchor,
        "fint_mode": cfg.solver.fint_mode,
        "partition_method": cfg.partition.method,
        "arch": cfg.surrogate.arch,
        "ridge_lambda": cfg.surrogate.ridge_lambda,
        "modal_dim": args.modal,
        "rollout_windows": args.rollout,
        "resync_blocks": args.resync,
        "filter_size": cfg.surrogate.filter_size,
        "n_past": cfg.surrogate.n_past,
        "hidden": cfg.surrogate.hidden_size,
        "epochs": cfg.surrogate.num_epochs,
        "consensus": not args.no_consensus,
        "ensemble": int(getattr(cfg.surrogate, "ensemble", 1) or 1),
        "cut_off": cfg.surrogate.cut_off,
        "input_noise": cfg.surrogate.input_noise,
        "seed": cfg.surrogate.seed,
        "hist_dtype": args.hist_dtype,
        "phases": int(getattr(cfg.surrogate, "window_phases", 1) or 1),
        "online_seconds": round(t_online, 1),
        "stage4_breakdown": stage4,
        "global_rel_l2": round(metrics.get("global_rel_l2_nonshared", -1), 5),
        "rel_l2_per_rank": [round(v, 5) for v in rels],
        "rel_l2_mean": round(sum(rels) / len(rels), 5),
    }
    print(json.dumps(summary, indent=2))
    tag = f"smooth{args.smooth}" + ("_nc" if args.no_consensus else "")
    if args.anchor:
        tag += "_anchor"
    if args.arch:
        tag += f"_{args.arch}"
    if args.ridge is not None:
        tag += f"_l{args.ridge:g}"
    if args.order is not None:
        tag += f"_M{args.order}"
    if args.phases:
        tag += f"_ph{args.phases}"
    if args.modal:
        tag += f"_modal{args.modal}"
    if args.rollout:
        tag += f"_W{args.rollout}"
    if args.resync:
        tag += f"_rs{args.resync}"
    if args.ensemble:
        tag += f"_E{args.ensemble}"
    if args.cutoff is not None:
        tag += f"_cut{args.cutoff:g}"
    if args.hist_dtype:
        tag += f"_h{args.hist_dtype}"
    if args.input_noise is not None:
        tag += f"_in{args.input_noise:g}"
    if args.seed is not None:
        tag += f"_s{args.seed}"
    if args.fint:
        tag += f"_fint-{args.fint}"
    if args.filter_size:
        tag += f"_ns{args.filter_size}"
    if args.n_past:
        tag += f"_np{args.n_past}"
    if args.hidden:
        tag += f"_h{args.hidden}"
    if args.epochs:
        tag += f"_e{args.epochs}"
    (out / f"online_{tag}.json").write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
