"""Per-step communication account + multi-chip projection (VERDICT r4
#5): settle what "sync-avoiding wins" means quantitatively.

Single-chip emulation prices a collective as HBM slice-adds, so the
measured exchanged-vs-comm-free contrast UNDERSTATES multi-chip reality
(the r4 committed numbers: 1.46x at 64 shards, 1.72x at 64 tube parts —
below BASELINE.md's >=2x north star — while 24.7x at 256 parts). This
script publishes the quantitative bridge:

per configuration (mesh x parts x exchange mode):
  * measured per-step comm-free and exchanged times on the current chip
    (best-of-2 timed scans, record='none' — the same contrast rows
    scale_demo commits);
  * ANALYTIC per-step exchange volume from the partition maps — what a
    real multi-device mesh would move over ICI per step:
      psum    : all-reduce of the 3*|global shared| vector
                (~2*SD*4 B per device, ring all-reduce)
      permute : packed neighbor buffers, sum over rounds of the real
                slots (send+recv per device)
      grid    : six face planes of the part box (send+recv per device)
  * projected multi-chip exchanged step = measured comm-free step +
    volume / ICI_bw + rounds * hop latency, and the resulting projected
    sync-avoiding speedup.

Reference contract being accounted: Tools/Distributed_tools.py:77-93
(root gather + scatter-add + bcast of the FULL global vector per step —
O(P*3N) volume; the table's modes are savtpu's ICI-native replacements).

Writes BENCH_COMM.json at the repo root. Run on the TPU (or CPU for the
analytic columns only).
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

# ICI per-chip parameters (jax-ml.github.io/scaling-book spec table;
# approximate, one-way per link). v5e: 2D torus, 4 links/chip.
ICI = {"bw_GBps_per_link": 45.0, "links": 4, "hop_latency_us": 1.0}


def exchange_bytes_per_step(sp, itemsize=4):
    """Analytic per-device ICI volume of one exchanged step, per mode."""
    out = {}
    P = sp.n_parts
    # psum: ring all-reduce of the (SD,) interface vector -> each device
    # sends and receives ~2*(P-1)/P * SD elements
    out["psum"] = float(2.0 * (P - 1) / P * sp.SD * itemsize)
    # permute: packed neighbor rounds (real slots only)
    if sp.nx_mask is not None:
        real = float(np.asarray(sp.nx_mask).sum()) / P  # per device
        out["permute"] = float(2.0 * real * itemsize)   # send + recv
    # grid: six face planes of the per-part node box
    if sp.grid_ndims is not None:
        NX, NY, NZ = sp.grid_ndims
        px, py, pz = sp.grid_pdims
        faces = 0
        if px > 1:
            faces += 2 * NY * NZ
        if py > 1 or sp.grid_wrap:
            faces += 2 * NX * NZ
        if pz > 1:
            faces += 2 * NX * NY
        out["grid"] = float(2.0 * 3 * faces * itemsize)  # send + recv
    return out


def project_multichip(commfree_ms, parts, bytes_per_dev, rounds):
    """P-device projection: on a real mesh each device steps ONE part,
    so per-device compute = measured single-chip all-parts time / P
    (the stacked step is embarrassingly parallel along the part axis);
    the exchanged step adds volume/ICI_bw + per-round hop latency. The
    single-chip emulated contrast prices a collective as HBM slice-adds
    and therefore understates this (VERDICT r4 weak-point 2)."""
    bw = ICI["bw_GBps_per_link"] * 1e9  # one link per neighbor leg
    cf_dev_ms = commfree_ms / parts
    t_comm_ms = (
        bytes_per_dev / bw + rounds * ICI["hop_latency_us"] * 1e-6
    ) * 1e3
    exch_ms = cf_dev_ms + t_comm_ms
    return {
        "projected_commfree_ms_per_step_per_device": cf_dev_ms,
        "projected_comm_ms": t_comm_ms,
        "projected_exchanged_ms_per_step": exch_ms,
        "projected_sync_avoid_speedup": exch_ms / max(cf_dev_ms, 1e-12),
    }


def one_config(cells, parts, pmethod, modes, n_steps, fint_by_mode):
    from savtpu.config import Config
    from savtpu.mesh import dirichlet_nodes
    from savtpu.parallel import (
        ShardedProblem, build_partition_maps, partition_elements,
    )
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.solvers import setup_problem

    cfg = Config()
    nx, ny, nz = cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    prob = setup_problem(cfg, dtype=jnp.float32)
    dnodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, parts, pmethod
    )
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )

    rows = {}
    for mode in modes:
        fint = fint_by_mode.get(mode, "banded")
        try:
            sp = ShardedProblem.build(
                prob, maps, fint_mode=fint, dtype=jnp.float32,
                exchange_mode=mode, compensated=True,
            )
        except ValueError as e:
            rows[mode] = {"skipped": str(e)}
            continue
        solver = ShardedSolver(sp, mesh=None)
        d0 = sp.localize(np.zeros(prob.ndof, np.float32))
        dn = sp.localize(np.zeros(prob.ndof, np.float32))

        def timed(sync):
            (_, _), c = solver.run(
                d0, dn, 0.0, n_steps, sync=sync, record="none"
            )
            jax.block_until_ready(c)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                (_, _), c = solver.run(
                    d0, dn, 0.0, n_steps, sync=sync, record="none"
                )
                jax.block_until_ready(c)
                best = min(best, (time.perf_counter() - t0) / n_steps)
            return best * 1e3  # ms/step

        cf_ms = timed(False)
        ex_ms = timed(True)
        vols = exchange_bytes_per_step(sp)
        vol = vols.get(mode, vols["psum"])
        rounds = (
            len(sp.nx_pairs) if mode == "permute" and sp.nx_pairs
            else 6 if mode == "grid" else
            2 * int(np.ceil(np.log2(max(parts, 2))))
        )
        # the reference's own per-step scheme for context: root gathers
        # every rank's FULL local force vector + bcasts the global one
        # (Tools/Distributed_tools.py:77-93) -> O(P*3N) at the root
        ref_root_bytes = float(
            2.0 * parts * (sp.DL - 1) * 4
        )
        rows[mode] = {
            "fint_mode": fint,
            "measured_commfree_ms_per_step": cf_ms,
            "measured_exchanged_ms_per_step": ex_ms,
            "measured_singlechip_speedup": ex_ms / cf_ms,
            "exchange_bytes_per_device_per_step": vol,
            "analytic_volumes_all_modes": vols,
            "reference_root_gather_bytes_per_step": ref_root_bytes,
            **project_multichip(cf_ms, parts, vol, rounds),
        }
        print(f"[comm] {cells} x {parts} {mode}: "
              f"cf={cf_ms:.4f}ms ex={ex_ms:.4f}ms "
              f"1chip={ex_ms/cf_ms:.2f}x "
              f"proj={rows[mode]['projected_sync_avoid_speedup']:.2f}x "
              f"({vol/1e3:.1f} kB/dev/step)", flush=True)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small configs only (CPU-friendly)")
    ap.add_argument("--steps", type=int, default=2000)
    args = ap.parse_args()

    configs = [
        # (cells, parts, pmethod, modes, fint_by_mode)
        ((96, 8, 8), 8, "box", ("psum", "permute", "grid"),
         {"grid": "stencil"}),
        ((96, 8, 8), 16, "box", ("psum", "permute", "grid"),
         {"grid": "stencil"}),
        ((192, 8, 8), 64, "box", ("psum", "permute", "grid"),
         {"grid": "stencil"}),
        ((384, 16, 16), 256, "box", ("psum", "grid"),
         {"psum": "stencil", "grid": "stencil"}),
    ]
    if args.quick:
        configs = [
            ((24, 4, 4), 4, "box", ("psum", "permute", "grid"),
             {"grid": "stencil"}),
            ((48, 4, 4), 8, "box", ("psum", "grid"),
             {"grid": "stencil"}),
        ]

    out = {"ici_model": ICI, "device": str(jax.devices()[0]),
           "steps_timed": args.steps, "configs": {}}
    for cells, parts, pm, modes, fints in configs:
        key = f"{cells[0]}x{cells[1]}x{cells[2]}_p{parts}"
        out["configs"][key] = one_config(
            cells, parts, pm, modes, args.steps, fints
        )
    Path("BENCH_COMM.json").write_text(json.dumps(out, indent=2))
    print("[comm] wrote BENCH_COMM.json")


if __name__ == "__main__":
    main()
