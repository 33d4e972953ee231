"""Decompose the exchanged-step cost at scale (stage-1 bottleneck).

At 384^3/256 the recorded pipeline runs stage 1 at ~81 steps/s while the
band-resident comm-free kernel does ~1048 steps/s — this script times the
exchanged scan's individual ingredients (band matvec, halo exchange,
update, translation-mean, shared gather/record) on the real device so
optimization targets the measured dominant term, not the guessed one.

Usage: python scripts/profile_exchanged.py [--cells 384 16 16] [--parts 256]
"""

from __future__ import annotations

import argparse
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

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.solvers import setup_problem


def timed(fn, *args, steps, reps=2):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3  # ms/step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=[384, 16, 16])
    ap.add_argument("--parts", type=int, default=256)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--mode", default="banded")
    ap.add_argument("--pmethod", default="rcb",
                    choices=("rcb", "box", "slab", "graph"))
    args = ap.parse_args()

    cfg = Config()
    cfg.beam_cells = tuple(args.cells)
    nx, ny, nz = args.cells
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    t0 = time.time()
    prob = setup_problem(cfg, dtype=jnp.float32)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, args.parts, args.pmethod
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode=args.mode, dtype=jnp.float32,
        compensated=True,
    )
    print(f"[setup] {time.time() - t0:.1f}s  DL={sp.DL} SD={sp.SD} "
          f"parts={args.parts} mode={sp.fint_mode}")
    if sp.band_Kd is not None:
        P, nc, Bk, _ = sp.band_Kd.shape
        band_mb = (sp.band_Kd.nbytes + sp.band_Kl.nbytes) / 2**20
        print(f"[band] nc={nc} Bk={Bk} total={band_mb:.0f} MiB "
              f"({band_mb / P:.2f} MiB/part)")

    d0 = sp.localize(np.zeros(prob.ndof, np.float32))
    N = args.steps

    # All big arrays flow through `data` jit ARGUMENTS (never baked-in
    # HLO constants — a 900 MB constant blows the remote-compile request
    # body; same design as ShardedSolver._build).
    from savtpu.parallel.sharded import ShardedSolver

    sol = ShardedSolver(sp)
    data = sol._data()

    # ---- full steps (compensated, as stage 1 runs them) ----
    @jax.jit
    def exchanged(data, d):
        lsp = sol._local_view(data)
        (_, _), c = lsp.stacked_run(d, d, 0.0, N, sync=True, record="none")
        return c[0]

    @jax.jit
    def commfree_scan(data, d):
        lsp = sol._local_view(data)
        (_, _), c = lsp.stacked_run(d, d, 0.0, N, sync=False,
                                    record="none")
        return c[0]

    def component(body_of):
        @jax.jit
        def fn(data, d):
            lsp = sol._local_view(data)
            body = body_of(lsp)

            def wrap(x, _):
                return body(x), None

            x, _ = jax.lax.scan(wrap, d, None, length=N)
            return x

        return fn

    matvec_only = component(
        lambda lsp: lambda x: x + 1e-30 * lsp._fint_stacked(x)
    )
    matvec_exchange = component(
        lambda lsp: lambda x: x + 1e-30 * lsp._exchange(
            lsp._fint_stacked(x), lambda v: v
        )
    )
    exchange_only = component(
        lambda lsp: lambda x: x + 1e-30 * lsp._exchange(x, lambda v: v)
    )

    # ---- exchange reformulations (candidate replacements for the vmapped
    # (P, SD) scatter+sum, which the r3 profile measured at 6.1 ms/step
    # at 384^3/256 — pure irregular-memory cost). Tables built here from
    # sld/sgi/smask; semantics of each = _exchange with identity reduce.
    S3 = sp.sld.shape[1]
    P = int(sp.sld.shape[0])
    SD = sp.SD
    sld_np = np.asarray(sp.sld)
    sgi_np = np.asarray(sp.sgi)
    sm_np = np.asarray(sp.smask)
    m_flat = sm_np.reshape(-1) > 0
    flat_ids = np.arange(P * S3, dtype=np.int64)[m_flat]
    g_real = sgi_np.reshape(-1)[m_flat]
    order = np.argsort(g_real, kind="stable")
    perm_np = flat_ids[order]
    gs_np = g_real[order]
    counts = np.bincount(gs_np, minlength=SD)
    O_max = max(int(counts.max(initial=1)), 1)
    own_T_np = np.full((O_max, SD), P * S3, dtype=np.int32)
    offs = np.zeros(SD + 1, dtype=np.int64)
    offs[1:] = np.cumsum(counts)
    slot = np.arange(len(gs_np)) - offs[gs_np]
    own_T_np[slot, gs_np] = perm_np
    gidx_np = np.zeros((P, sp.DL), dtype=np.int32)
    issh_np = np.zeros((P, sp.DL), dtype=np.float32)
    pp = np.repeat(np.arange(P), S3)[m_flat]
    ld = sld_np.reshape(-1)[m_flat]
    gidx_np[pp, ld] = g_real
    issh_np[pp, ld] = 1.0
    print(f"[exch] S3={S3} O_max={O_max} SD={SD} "
          f"real pairs={len(gs_np)}")

    sgi_flat = jnp.asarray(sgi_np.reshape(-1))
    perm_j = jnp.asarray(perm_np.astype(np.int32))
    gs_j = jnp.asarray(gs_np.astype(np.int32))
    own_T = jnp.asarray(own_T_np)
    gidx = jnp.asarray(gidx_np)
    issh = jnp.asarray(issh_np)

    def shared_vals(lsp, x):  # (P*S3,) masked contributions + trailing 0
        v = (jax.vmap(lambda F, s: F[s])(x, lsp.sld) * lsp.smask)
        return jnp.concatenate(
            [v.reshape(-1), jnp.zeros((1,), x.dtype)]
        )

    def setback_scatter(lsp, x, tot):
        return jax.vmap(lambda F, s, g: F.at[s].set(tot[g]))(
            x, lsp.sld, lsp.sgi
        )

    def setback_gather(lsp, x, tot):
        return x * (1.0 - issh) + tot[gidx] * issh

    def ex_flat(lsp, x):  # one flat scatter-add into (SD,)
        vals = shared_vals(lsp, x)[:-1]
        tot = jnp.zeros((SD,), x.dtype).at[sgi_flat].add(vals)
        return setback_scatter(lsp, x, tot)

    def ex_segsum(lsp, x):  # g-sorted gather + sorted segment_sum
        vals = shared_vals(lsp, x)
        tot = jax.ops.segment_sum(
            vals[perm_j], gs_j, num_segments=SD, indices_are_sorted=True
        )
        return setback_scatter(lsp, x, tot)

    def ex_gatherT(lsp, x):  # O_max row-major lane-gathers of (SD,)
        vals = shared_vals(lsp, x)
        tot = vals[own_T[0]]
        for o in range(1, O_max):
            tot = tot + vals[own_T[o]]
        return setback_scatter(lsp, x, tot)

    def ex_gatherT_gb(lsp, x):  # + gather-based setback
        vals = shared_vals(lsp, x)
        tot = vals[own_T[0]]
        for o in range(1, O_max):
            tot = tot + vals[own_T[o]]
        return setback_gather(lsp, x, tot)

    def mk(ex):
        return component(lambda lsp: lambda x: x + 1e-30 * ex(lsp, x))

    # correctness: every variant must reproduce the production exchange
    lsp0 = sol._local_view(data)
    x_test = jnp.asarray(
        np.random.default_rng(0).standard_normal(d0.shape), np.float32
    ) * jnp.asarray(np.asarray(sp.dof_mask), np.float32)
    ref = jax.jit(lambda x: lsp0._exchange(x, lambda v: v))(x_test)
    for name, ex in [("B", ex_flat), ("C", ex_segsum),
                     ("D", ex_gatherT), ("E", ex_gatherT_gb)]:
        got = jax.jit(lambda x, ex=ex: ex(lsp0, x))(x_test)
        err = float(jnp.max(jnp.abs(got - ref)))
        scale = float(jnp.max(jnp.abs(ref)))
        print(f"[check {name}] max abs diff vs scatter = {err:.3e} "
              f"(scale {scale:.3e})")

    ex_rows = [
        ("exchange B: flat scatter-add", mk(ex_flat)),
        ("exchange C: sorted segment_sum", mk(ex_segsum)),
        ("exchange D: transposed gather", mk(ex_gatherT)),
        ("exchange E: D + gather setback", mk(ex_gatherT_gb)),
    ]
    tmean_only = component(
        lambda lsp: lambda x: x + 1e-30 * lsp._translation_mean(x)
    )
    gather_only = component(
        lambda lsp: lambda x: x.at[:, 0].add(
            1e-30 * lsp._gather_shared(x)[:, 0]
        )
    )

    # recorded run, like stage 1 (save_every from the reference schedule)
    se = 20
    Nrec = (N // se) * se

    @jax.jit
    def exchanged_recorded(data, d):
        lsp = sol._local_view(data)
        (tr, sh), c = lsp.stacked_run(
            d, d, 0.0, Nrec, sync=True, record="all", save_every=se
        )
        return c[0]

    # ---- structured face-plane exchange (exchange_mode="grid") --------
    # own build: grid requires box partition + lex node order
    grid_rows = []
    from savtpu.parallel import stencil as _stencil

    if _stencil.detect_box_partition(prob.mesh, maps) is not None:
        sp_g = ShardedProblem.build(
            prob, maps, fint_mode=args.mode, dtype=jnp.float32,
            compensated=True, exchange_mode="grid",
        )
        sol_g = ShardedSolver(sp_g)
        data_g = sol_g._data()
        d0_g = sp_g.localize(np.zeros(prob.ndof, np.float32))

        @jax.jit
        def exchanged_grid(data, d):
            lsp = sol_g._local_view(data)
            (_, _), c = lsp.stacked_run(d, d, 0.0, N, sync=True,
                                        record="none")
            return c[0]

        @jax.jit
        def grid_only(data, d):
            lsp = sol_g._local_view(data)

            def wrap(x, _):
                return x + 1e-30 * lsp._exchange_grid(x), None

            x, _ = jax.lax.scan(wrap, d, None, length=N)
            return x

        grid_rows = [
            ("exchanged full step (GRID)", exchanged_grid, N, data_g, d0_g),
            ("exchange only (GRID face-planes)", grid_only, N, data_g,
             d0_g),
        ]
    else:
        print("[grid] partition not box-aligned — grid exchange skipped "
              "(use --pmethod box)")

    rows = [
        ("exchanged full step (record none)", exchanged, N),
        ("exchanged + record all/se=20", exchanged_recorded, Nrec),
        ("comm-free lax-scan (record none)", commfree_scan, N),
        ("band matvec only", matvec_only, N),
        ("matvec + exchange", matvec_exchange, N),
        ("exchange only (scatter)", exchange_only, N),
        *[(name, fn, N) for name, fn in ex_rows],
        ("translation-mean only", tmean_only, N),
        ("gather_shared only", gather_only, N),
        *grid_rows,
    ]
    print(f"\n{'component':40s}  ms/step   steps/s")
    for row in rows:
        name, fn, steps = row[:3]
        dd, xx = (row[3], row[4]) if len(row) > 3 else (data, d0)
        try:
            ms = timed(fn, dd, xx, steps=steps)
            print(f"{name:40s}  {ms:7.3f}   {1e3 / ms:8.0f}")
        except Exception as e:
            print(f"{name:40s}  ERROR {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
