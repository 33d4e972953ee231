"""Measure the f32 trajectory noise floor on TPU, with and without
compensated integration, against a CPU float64 truth.

The plain f32 stepper drifts ~9% rel-L2 from the f64 trajectory by 50k
steps (docs/PRECISION.md §3 — ulp-level state-roll rounding pumped through
the near-undamped modes). ``solver.compensated`` carries the state as a
TwoSum (hi, lo) pair and keeps the matvec's translation nullspace; this
script records how far that lifts the floor on real TPU hardware, and what
it costs in steps/s.

Two-process: float64 is not available on TPU, so the truth run re-execs
this script with --mode truth under JAX_PLATFORMS=cpu.

Usage: python scripts/precision_floor.py [--steps N] [--parts P]
       [--cells nx ny nz] [--out DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SAVE_EVERY = 100


def build(args, dtype, compensated=False):
    import jax.numpy as jnp

    from savtpu.config import Config
    from savtpu.mesh import dirichlet_nodes
    from savtpu.parallel import (
        ShardedProblem, build_partition_maps, partition_elements,
    )
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.solvers import setup_problem

    cfg = Config()
    nx, ny, nz = args.cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    prob = setup_problem(cfg, dtype=dtype)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, args.parts, "rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode="dense", dtype=dtype, compensated=compensated
    )
    return prob, sp, ShardedSolver(sp)


def run_traj(prob, sp, solver, steps):
    import numpy as np

    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    t0 = time.time()
    (traj, _), carry = solver.run(
        d0, dnl, 0.0, steps, sync=True, record="traj",
        save_every=SAVE_EVERY,
    )
    traj = np.asarray(traj)
    return traj, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--cells", type=int, nargs=3, default=(48, 4, 4))
    ap.add_argument("--out", type=str, default="runs/precision_floor")
    ap.add_argument("--mode", choices=["main", "truth"], default="main")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    truth_npz = out / "truth_f64.npz"

    if args.mode == "truth":
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp
        import numpy as np

        prob, sp, solver = build(args, jnp.float64)
        traj, secs = run_traj(prob, sp, solver, args.steps)
        np.savez_compressed(truth_npz, traj=traj.astype(np.float64),
                            seconds=secs)
        print(f"[truth] f64 CPU {secs:.1f}s", flush=True)
        return

    if not truth_npz.exists():
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run(
            [sys.executable, __file__, "--mode", "truth",
             "--steps", str(args.steps), "--parts", str(args.parts),
             "--cells", *map(str, args.cells), "--out", args.out],
            check=True, env=env,
        )

    import jax
    import jax.numpy as jnp
    import numpy as np

    from savtpu.pipeline.common import resolve_cache_dir
    jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))

    ref = np.load(truth_npz)["traj"]
    results = {
        "cells": list(args.cells), "parts": args.parts,
        "steps": args.steps, "device": str(jax.devices()[0]),
        "save_every": SAVE_EVERY,
    }
    ckpts = [len(ref[0]) // 4, len(ref[0]) // 2, len(ref[0]) - 1]
    for comp in (False, True):
        prob, sp, solver = build(args, jnp.float32, compensated=comp)
        traj, secs = run_traj(prob, sp, solver, args.steps)  # warm incl.
        traj2, secs2 = run_traj(prob, sp, solver, args.steps)  # timed
        key = "compensated" if comp else "plain"
        errs = {}
        for c in ckpts:
            t_step = (c + 1) * SAVE_EVERY
            e = np.linalg.norm(traj[:, c] - ref[:, c]) / max(
                np.linalg.norm(ref[:, c]), 1e-30
            )
            errs[f"relL2_at_{t_step}"] = round(float(e), 6)
        full = np.linalg.norm(traj - ref) / np.linalg.norm(ref)
        results[key] = {
            **errs,
            "relL2_traj": round(float(full), 6),
            "steps_per_sec": round(args.steps / secs2, 1),
        }
        print(f"[{key}] {errs} traj={full:.2%} "
              f"{args.steps / secs2:.0f} steps/s", flush=True)

    if results["compensated"]["relL2_traj"] > 0:
        results["floor_lift"] = round(
            results["plain"]["relL2_traj"]
            / results["compensated"]["relL2_traj"], 1
        )
    (out / "summary.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
