"""savtpu benchmark — prints ONE JSON line with the headline metric.

Metric: explicit timesteps/sec of the synchronization-avoiding (comm-free)
stepper on the reference benchmark problem (25x1x1 cantilever, 2 spatial
shards, BASELINE.md configuration), run on the available accelerator in
float32. ``vs_baseline``: speedup over a NumPy/SciPy implementation of the
reference's per-step hot loop (SciPy CSR matvec + vector algebra,
Tools/Dynamic_solver.py:9-34) timed in-process on the host CPU — the
reference repo publishes no numbers (BASELINE.json `published: {}`), so
its own algorithm re-timed on this machine is the baseline.

Extended measurements (exchanged-mode throughput, sync-avoid speedup vs
exchanged, predictor overhead) go to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


def _numpy_baseline_steps_per_sec(prob, maps, n_steps=2000):
    """Reference-equivalent per-rank hot loop: SciPy CSR matvec + vector
    update in a Python time loop (per-step cost model of the reference at
    MODEL=True, i.e. without MPI)."""
    import scipy.sparse as sp_sparse

    from savtpu.ops.assembly import assemble_dense

    cells = prob.mesh.tetra
    rank_ops = []
    for p in range(maps.n_parts):
        nodes = maps.local_nodes[p]
        gdofs = (3 * nodes[:, None] + np.arange(3)).reshape(-1)
        lookup = {int(g): i for i, g in enumerate(nodes)}
        K_loc = np.zeros((3 * len(nodes), 3 * len(nodes)))
        Ke = np.asarray(prob.Ke)
        for e in maps.local_elements[p]:
            loc = np.array([lookup[int(n)] for n in cells[e]])
            ed = (3 * loc[:, None] + np.arange(3)).reshape(-1)
            K_loc[np.ix_(ed, ed)] += Ke[e]
        rank_ops.append(
            (
                sp_sparse.csr_matrix(K_loc),
                np.asarray(prob.F_pre)[gdofs].reshape(-1, 1),
                np.asarray(prob.lumped_M)[gdofs].reshape(-1, 1),
                maps.local_dirichlet[p],
            )
        )

    dt, alpha = prob.dt, prob.alpha
    # best-of-3: the host-CPU baseline showed 2.3x cross-session variance
    # between rounds (ADVICE r3) — a single timing is machine-state noise,
    # not a baseline. Repetitions share warmed caches.
    best = 0.0
    for _ in range(3):
        states = [
            (np.zeros_like(F), np.zeros_like(F)) for _, F, _, _ in rank_ops
        ]
        t0 = time.perf_counter()
        tn = 0.0
        for i in range(n_steps):
            ramp = min(tn, 1.0)
            for p, (K, F_pre, lM, dirich) in enumerate(rank_ops):
                d0, dn = states[p]
                F_int = K.dot(d0)
                F_ext = F_pre * ramp
                d1 = (
                    dt * dt * (F_ext - F_int)
                    + 2 * lM * d0
                    - lM * dn
                    + 0.5 * dt * alpha * lM * dn
                ) / (lM + 0.5 * alpha * dt * lM)
                d1[dirich] = 0.0
                states[p] = (d1, d0)
            tn += dt
        best = max(best, n_steps / (time.perf_counter() - t0))
    return best


def _roofline_row(sp, steps_per_sec):
    """Roofline/MFU fields (VERDICT r4 #7): analytic flops/step (exact
    loop-structure count of the force kernel + update algebra) and the
    analytic HBM-traffic floor (the carry/coefficient/operator arrays
    that must stream every step), converted to achieved GB/s / GFLOP/s
    and % of device peaks. The bytes model is a FLOOR, so %HBM is a
    conservative lower bound on achieved bandwidth."""
    from savtpu.utils import roofline as rl

    floor = rl.bytes_floor_per_step(sp)
    fl = rl.flops_model(sp)
    row = rl.roofline(
        steps_per_sec,
        bytes_per_step=floor["bytes_per_step_floor"],
        flops_per_step=fl["flops_per_step"],
    )
    row["bytes_model"] = floor
    row["flops_model"] = fl
    return row


def main():
    import jax
    import jax.numpy as jnp

    from savtpu.config import Config
    from savtpu.mesh import dirichlet_nodes, read_vtk
    from savtpu.parallel import ShardedProblem, build_partition_maps, partition_elements
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.solvers import setup_problem

    jax.config.update(
        "jax_compilation_cache_dir", "/tmp/savtpu_jax_cache"
    )
    cfg = Config()
    ref_mesh = Path("/root/reference/Mesh_info/beam_coarse.vtk")
    mesh = read_vtk(ref_mesh) if ref_mesh.exists() else None

    prob = setup_problem(cfg, mesh=mesh, dtype=jnp.float64)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dnodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )

    # device path in float32 (benchmark dtype; parity runs use f64 on
    # host). Benchmark governance (VERDICT r2 #3): the comm-free headline
    # is measured in BOTH candidate F_int modes (dense HBM-streaming
    # matvec and VMEM-resident pallas whole-scan kernel), best-of-2 reps
    # each to control cross-session variance, and the MAX is reported;
    # per-mode numbers are recorded in BENCH_DETAILS.json.
    n_steps = 30_000
    reps = 2

    rooflines = {}

    def timed(fint_mode, sync):
        sp = ShardedProblem.build(
            prob, maps, fint_mode=fint_mode, dtype=jnp.float32
        )
        solver = ShardedSolver(sp, mesh=None)  # single-chip emulated
        d0 = sp.localize(np.zeros(prob.ndof, np.float32))
        dn = sp.localize(np.zeros(prob.ndof, np.float32))
        (_, _), carry = solver.run(
            d0, dn, 0.0, n_steps, sync=sync, record="none"
        )  # compile
        jax.block_until_ready(carry)
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            (_, _), carry = solver.run(
                d0, dn, 0.0, n_steps, sync=sync, record="none"
            )
            jax.block_until_ready(carry)
            best = max(best, n_steps / (time.perf_counter() - t0))
        rooflines[f"{fint_mode}_{'exch' if sync else 'avoid'}"] = (
            _roofline_row(sp, best)
        )
        return best

    avoid_by_mode = {
        mode: timed(mode, sync=False) for mode in ("dense", "pallas")
    }
    avoid_mode = max(avoid_by_mode, key=avoid_by_mode.get)
    avoid_sps = avoid_by_mode[avoid_mode]
    exch_sps = timed("dense", sync=True)
    base_sps = _numpy_baseline_steps_per_sec(prob, maps)

    # Scale-representative second headline (VERDICT r3 #8): the toy
    # 110-node mesh is latency-bound (±5-9% cross-session variance); the
    # 96x8x8 / 16-shard banded compensated row is the accuracy-study
    # deployment configuration and is compute-bound.
    scale = _scale_row(n_steps=4000)

    n_elem = len(prob.mesh.tetra)
    details = {
        "problem": "cantilever beam, 110 nodes / 256 tets, 2 shards",
        "device": str(jax.devices()[0]),
        "sync_avoiding_steps_per_sec": avoid_sps,
        "sync_avoiding_mode": avoid_mode,
        "sync_avoiding_by_mode": avoid_by_mode,
        "exchanged_steps_per_sec": exch_sps,
        "numpy_reference_loop_steps_per_sec": base_sps,
        "numpy_reference_timing": "best of 3 in-process reps",
        "sync_avoid_over_exchanged": avoid_sps / exch_sps,
        "element_updates_per_sec": avoid_sps * n_elem,
        "speedup_vs_numpy_reference": avoid_sps / base_sps,
        "roofline_toy": rooflines,
        "scale_96x8x8_16shards": scale,
    }
    Path("BENCH_DETAILS.json").write_text(json.dumps(details, indent=2))

    print(
        json.dumps(
            {
                "metric": "sync_avoiding_timesteps_per_sec",
                "value": round(avoid_sps, 1),
                "unit": "steps/s",
                "vs_baseline": round(avoid_sps / base_sps, 2),
                "scale_96x8x8_16shards_steps_per_sec": round(
                    scale["sync_avoiding_steps_per_sec"], 1
                ),
                "scale_96x8x8_16shards_elem_updates_per_sec": round(
                    scale["element_updates_per_sec"], 1
                ),
            }
        )
    )


def _scale_row(n_steps=4000):
    """Comm-free throughput at 96x8x8 (36,864 tets) / 16 shards,
    compensated f32 — the production deployment config of the accuracy
    studies (benchmarks/sweep.py case list; docs/STATUS_r3.md).

    Measured in BOTH production F_int modes (banded-RCM on an RCB
    partition — the generic path — and the gather-free structured-box
    stencil on a box partition, docs/STATUS_r4.md #5); the max is the
    headline, per-mode numbers ride in BENCH_DETAILS.json.
    """
    import jax
    import jax.numpy as jnp

    from savtpu.config import Config
    from savtpu.mesh import dirichlet_nodes
    from savtpu.parallel import (
        ShardedProblem,
        build_partition_maps,
        partition_elements,
    )
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.solvers import setup_problem

    cfg = Config()
    cfg.beam_cells = (96, 8, 8)
    cfg.beam_extent = (12.0, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=jnp.float32)
    dnodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)

    rooflines = {}

    def timed(fint_mode, pmethod):
        epart = partition_elements(
            prob.mesh.tetra, prob.mesh.points, 16, pmethod
        )
        maps = build_partition_maps(
            prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
        )
        sp = ShardedProblem.build(
            prob, maps, fint_mode=fint_mode, dtype=jnp.float32,
            compensated=True,
        )
        solver = ShardedSolver(sp, mesh=None)
        d0 = sp.localize(np.zeros(prob.ndof, np.float32))
        dn = sp.localize(np.zeros(prob.ndof, np.float32))
        (_, _), carry = solver.run(
            d0, dn, 0.0, n_steps, sync=False, record="none"
        )  # compile
        jax.block_until_ready(carry)
        best = 0.0
        for _ in range(2):
            t0 = time.perf_counter()
            (_, _), carry = solver.run(
                d0, dn, 0.0, n_steps, sync=False, record="none"
            )
            jax.block_until_ready(carry)
            best = max(best, n_steps / (time.perf_counter() - t0))
        rooflines[fint_mode] = _roofline_row(sp, best)
        return best

    by_mode = {
        "banded": timed("banded", "rcb"),
        "stencil": timed("stencil", "box"),
    }
    mode = max(by_mode, key=by_mode.get)
    best = by_mode[mode]
    return {
        "mesh": "96x8x8",
        "elements": len(prob.mesh.tetra),
        "n_parts": 16,
        "fint_mode": mode,
        "by_mode": by_mode,
        "compensated": True,
        "sync_avoiding_steps_per_sec": best,
        "element_updates_per_sec": best * len(prob.mesh.tetra),
        "roofline": rooflines,
    }


if __name__ == "__main__":
    main()
