"""Scale-out benchmark sweep (SURVEY.md §7 phase 6).

Measures explicit timesteps/sec and element-updates/sec across mesh
refinements x shard counts x F_int strategies, in both exchanged and
sync-avoiding modes, on the available accelerator. Writes
benchmarks/results.json and prints a markdown table.

Usage: python benchmarks/sweep.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/savtpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import setup_problem


def bench_case(nx, ny, nz, n_parts, mode, steps, exchange="psum",
               compensated=False, nh=False):
    cfg = Config()
    mesh = None
    if nx == "ref":  # the reference repo's actual 256-tet beam VTK
        from savtpu.mesh import read_vtk

        mesh = read_vtk("/root/reference/Mesh_info/beam_coarse.vtk")
    else:
        cfg.beam_cells = (nx, ny, nz)
        cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    prob = setup_problem(cfg, mesh=mesh, dtype=jnp.float32)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, "rcb"
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    material = None
    if nh:
        from savtpu.ops.material import NeoHookean

        material = NeoHookean.from_engineering(
            E=1e6, nu=0.3, rho=1.0, fz=0.5
        )
    sp = ShardedProblem.build(
        prob, maps, fint_mode=mode, dtype=jnp.float32,
        exchange_mode=exchange, compensated=compensated,
        material=material,
    )
    sol = ShardedSolver(sp)
    d0 = sp.localize(np.zeros(prob.ndof, np.float32))

    out = {
        "mesh": "ref_beam_256" if nx == "ref" else f"{nx}x{ny}x{nz}",
        "elements": len(prob.mesh.tetra),
        "ndof": prob.ndof,
        "n_parts": n_parts,
        "DL": sp.DL,
        "fint_mode": sp.fint_mode,
        "exchange_mode": exchange,
        "compensated": compensated,
    }
    # per-step exchange volume accounting (VERDICT r2 #5): psum moves a
    # replicated (3*|global shared|,) buffer per part; the neighbor-packed
    # permute moves only each pair's interface DOFs (sum over rounds of
    # real packed slots). Counted from the maps — independent of timing.
    out["psum_volume_dofs_per_part"] = sp.SD
    if exchange == "permute" and sp.nx_mask is not None:
        vol = np.asarray(sp.nx_mask).sum(axis=(1, 2))  # per-part send DOFs
        out["permute_volume_dofs_per_part_max"] = float(vol.max())
        out["permute_volume_dofs_per_part_mean"] = float(vol.mean())
        out["permute_rounds"] = int(sp.nx_pack.shape[1])
    for sync, name in ((False, "sync_avoiding"), (True, "exchanged")):
        (_, _), c = sol.run(d0, d0, 0.0, steps, sync=sync, record="none")
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        (_, _), c = sol.run(d0, d0, 0.0, steps, sync=sync, record="none")
        jax.block_until_ready(c)
        el = time.perf_counter() - t0
        out[f"{name}_steps_per_sec"] = steps / el
        out[f"{name}_elem_updates_per_sec"] = steps / el * out["elements"]
    out["sync_avoid_speedup"] = (
        out["sync_avoiding_steps_per_sec"] / out["exchanged_steps_per_sec"]
    )
    return out


CASES = [
    # (nx, ny, nz, parts, mode, steps)
    ("ref", 0, 0, 2, "dense", 20000),  # the reference's own 256-tet VTK
    ("ref", 0, 0, 2, "pallas", 20000),
    (25, 1, 1, 2, "dense", 20000),     # generated 25x1x1 beam (150 tets)
    (25, 1, 1, 2, "pallas", 20000),    # whole-scan kernel, K VMEM-resident
    (48, 4, 4, 8, "dense", 5000),
    (48, 4, 4, 8, "pallas", 5000),
    (96, 8, 8, 8, "dense", 2000),
    (96, 8, 8, 8, "banded", 2000),
    (96, 8, 8, 8, "pallas", 2000),
    (96, 8, 8, 16, "banded", 2000),   # the accuracy-study deployment config

    (96, 8, 8, 64, "dense", 2000),
    (96, 8, 8, 64, "ell", 2000),
    (192, 12, 12, 64, "banded", 1000),
    (192, 12, 12, 256, "dense", 1000),
    # 3000 steps: at 500 the ~5 ms fixed cost of each of the 256
    # sequential pallas grid programs dominates (measured 313
    # steps/s vs ~1.5k amortized)
    (384, 16, 16, 256, "banded", 3000),  # 590k tets on one chip
    # exchanged-path halo variants (psum vs neighbor-packed permute)
    (48, 4, 4, 8, "dense", 5000, "permute"),
    (96, 8, 8, 64, "dense", 2000, "permute"),
    (192, 12, 12, 64, "banded", 1000, "permute"),
    (384, 16, 16, 256, "banded", 2000, "permute"),
    # compensated (double-word f32) overhead check at two scales
    (48, 4, 4, 8, "dense", 5000, "psum", True),
    (192, 12, 12, 64, "banded", 1000, "psum", True),
    # Neo-Hookean matrix-free stepping (per-step force recompute)
    (48, 4, 4, 8, "auto", 2000, "psum", False, True),
]

QUICK = [(25, 1, 1, 2, "dense", 5000), (48, 4, 4, 8, "ell", 2000)]


def _case_tag(case):
    mesh = ("ref_beam_256" if case[0] == "ref"
            else f"{case[0]}x{case[1]}x{case[2]}")
    exch = case[6] if len(case) > 6 else "psum"
    comp = bool(case[7]) if len(case) > 7 else False
    return (mesh, case[3], case[4], exch, comp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="substring filter on 'mesh/parts/mode'; matching "
                         "cases are re-run and MERGED into results.json "
                         "(other rows kept)")
    args = ap.parse_args()
    cases = QUICK if args.quick else CASES
    if args.only:
        cases = [c for c in CASES
                 if args.only in "{}/{}/{}".format(*_case_tag(c)[:3])]
        print(f"[sweep] --only '{args.only}': {len(cases)} case(s)")

    results = []
    for case in cases:
        try:
            r = bench_case(*case)
        except Exception as e:  # keep sweeping on per-case failure
            name = ("ref_beam_256" if case[0] == "ref"
                    else f"{case[0]}x{case[1]}x{case[2]}")
            r = {"mesh": name,
                 "n_parts": case[3], "fint_mode": case[4],
                 "error": f"{type(e).__name__}: {e}"}
        results.append(r)
        print(json.dumps(r), flush=True)

    res_path = Path(__file__).parent / "results.json"
    if args.only and res_path.exists():
        # merge: replace rows with the same identity, keep the rest
        def _row_tag(r):
            return (r.get("mesh"), r.get("n_parts"), r.get("fint_mode"),
                    r.get("exchange_mode", "psum"),
                    r.get("compensated", False))

        old = json.loads(res_path.read_text())["results"]
        new_tags = {_row_tag(r) for r in results}
        merged, inserted = [], False
        for r in old:
            if _row_tag(r) in new_tags:
                if not inserted:
                    merged.extend(results)
                    inserted = True
            else:
                merged.append(r)
        if not inserted:
            merged.extend(results)
        results = merged
    out = {
        "device": str(jax.devices()[0]),
        "results": results,
    }
    res_path.write_text(json.dumps(out, indent=2))

    print("\n| mesh | E | parts | mode | avoid steps/s | Melem/s | vs exchanged |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        if "error" in r:
            print(f"| {r['mesh']} | - | {r['n_parts']} | {r['fint_mode']} "
                  f"| ERROR | - | - |")
            continue
        print(
            f"| {r['mesh']} | {r['elements']} | {r['n_parts']} "
            f"| {r['fint_mode']} | {r['sync_avoiding_steps_per_sec']:,.0f} "
            f"| {r['sync_avoiding_elem_updates_per_sec']/1e6:,.1f} "
            f"| {r['sync_avoid_speedup']:.2f}x |"
        )


if __name__ == "__main__":
    main()
