"""Unstructured-mesh performance on the TPU (VERDICT r4 #2).

The reference's natural habitat is ARBITRARY tet meshes (ParMETIS k-way
on any dual graph, Data_prepare.py:92-101; per-element assembly over
arbitrary tets, Tools/Mat_construction.py:79-119). savtpu's structured
fast paths (stencil fint, grid exchange) cannot fire there; this bench
measures what a user actually gets on a genuinely irregular mesh — a
graded+jittered Delaunay beam read through the binary gmsh ``.msh``
path — and pins the windowed one-hot MXU kernel's gain over the r4
incident-gather floor (measured 3.3M elem-updates/s; target >= 10x).

Modes timed (pure scans, no recording, best of ``--reps``):
  nh-incident   generic gather NH forces (the r4 fallback)
  nh-window     windowed one-hot MXU gather/scatter (r5)
  linear-banded the unstructured linear fast path, for context
Each in comm-free (sync-avoiding) and exchanged (psum) stepping.

Usage:
  python scripts/bench_unstructured.py --cells 96 8 8 --parts 16 \
      [--steps 2000] [--out BENCH_UNSTRUCTURED.json]
"""

from __future__ import annotations

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(96, 8, 8))
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--pmethod", type=str, default="graph")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--steps-exchanged", type=int, default=400)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--jitter", type=float, default=0.25)
    ap.add_argument("--grade", type=float, default=1.5)
    ap.add_argument("--out", type=str, default="BENCH_UNSTRUCTURED.json")
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.mesh import dirichlet_nodes, read_mesh, write_msh
    from savtpu.mesh.generator import irregular_beam_mesh
    from savtpu.ops.material import NeoHookean
    from savtpu.parallel import (
        ShardedProblem,
        build_partition_maps,
        partition_elements,
    )
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.solvers import setup_problem

    nx, ny, nz = args.cells
    mesh0 = irregular_beam_mesh(
        nx, ny, nz, extent=(float(nx) / max(ny, 1), 1.0, 1.0),
        jitter=args.jitter, grade=args.grade,
    )
    # round-trip through binary gmsh output: the ingestion path real
    # gmsh users hit (mesh/msh_io.py binary blocks)
    mpath = Path("/tmp/bench_unstructured.msh")
    write_msh(mpath, mesh0, binary=True)
    cfg = Config()
    cfg.mesh_path = str(mpath)
    prob = setup_problem(cfg, dtype=jnp.float32)
    mesh = prob.mesh
    n_tets = len(mesh.tetra)
    dnodes = dirichlet_nodes(mesh.triangles, mesh.points)
    m = cfg.material
    mat = NeoHookean.from_engineering(m.E, m.nu, m.rho, m.fz)

    epart = partition_elements(
        mesh.tetra, mesh.points, args.parts, args.pmethod
    )
    maps = build_partition_maps(
        mesh.tetra, epart, mesh.num_points, dnodes
    )

    def timed(sp, steps, sync):
        solver = ShardedSolver(sp)
        d0 = sp.localize(np.zeros(prob.ndof, np.float32))
        _, carry = solver.run(
            d0, d0, 0.0, steps, sync=sync, record="none"
        )
        jax.block_until_ready(carry)
        best = 0.0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _, carry = solver.run(
                d0, d0, 0.0, steps, sync=sync, record="none"
            )
            jax.block_until_ready(carry)
            best = max(best, steps / (time.perf_counter() - t0))
        return best

    rows = {}
    builds = [
        ("nh-incident", dict(material=mat, nh_gather="incident")),
        ("nh-window", dict(material=mat, nh_gather="window")),
        ("linear-banded", dict(fint_mode="banded")),
    ]
    for name, kw in builds:
        t0 = time.perf_counter()
        sp = ShardedProblem.build(
            prob, maps, dtype=jnp.float32, exchange_mode="psum", **kw
        )
        build_s = time.perf_counter() - t0
        cf = timed(sp, args.steps, sync=False)
        ex = timed(sp, args.steps_exchanged, sync=True)
        rows[name] = {
            "build_seconds": round(build_s, 2),
            "commfree_steps_per_sec": round(cf, 1),
            "commfree_elem_updates_per_sec": round(cf * n_tets),
            "exchanged_steps_per_sec": round(ex, 1),
            "exchanged_ms_per_step": round(1000.0 / ex, 3),
        }
        print(f"[unstructured] {name}: comm-free {cf:.0f} steps/s "
              f"({cf * n_tets / 1e6:.1f}M eups), exchanged {ex:.0f} "
              f"steps/s", flush=True)

    win = rows["nh-window"]["commfree_elem_updates_per_sec"]
    inc = rows["nh-incident"]["commfree_elem_updates_per_sec"]
    out = {
        "problem": (
            f"irregular Delaunay beam {nx}x{ny}x{nz} seed grid, "
            f"jitter {args.jitter}, grade {args.grade} — "
            f"{mesh.num_points} nodes / {n_tets} tets / "
            f"{args.parts} parts ({args.pmethod})"
        ),
        "device": str(jax.devices()[0]),
        "n_tets": n_tets,
        "n_nodes": int(mesh.num_points),
        "n_parts": args.parts,
        "modes": rows,
        "window_over_incident": round(win / max(inc, 1), 2),
        "r4_incident_floor_eups": 3.3e6,
        "window_over_r4_floor": round(win / 3.3e6, 2),
    }
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps({k: v for k, v in out.items() if k != "modes"}))


if __name__ == "__main__":
    main()
