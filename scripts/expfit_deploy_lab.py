"""Deployment replay of the expfit feed at the real 96x8x8/16 size, on
CPU, short horizon — bisecting the r3 finding that a 2.5e-4-accurate
expfit feed deploys to ~8% global error (runs/scale_96, queue_r3c) while
exact rows are identity (scripts/fused_identity_lab.py).

Reuses the stage-1 artifacts in runs/scale_96 (trace + mesh config),
fits expfit in-process (never touches the model dir — a TPU queue may
be using it), drives the REAL fused runner for a few blocks, and
compares at recorded slots:
  deployed shared rows  vs  the coefficient feed  vs  truth.

Usage: JAX_PLATFORMS=cpu python scripts/expfit_deploy_lab.py [--blocks 3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/scale_96")
    ap.add_argument("--cells", type=int, nargs=3, default=(96, 8, 8))
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--blocks", type=int, default=3)
    ap.add_argument("--modal", type=int, default=8)
    args = ap.parse_args()

    import h5py
    import jax.numpy as jnp

    from savtpu.config import Config
    from savtpu.models.expfit import eval_expfit, fit_expfit
    from savtpu.models.modal import modal_basis, to_modal
    from savtpu.pipeline.common import build_context
    from savtpu.pipeline.online_predictor import make_block_group_runner

    out = Path(args.dir)
    cfg = Config()
    nx, ny, nz = args.cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    cfg.workdir = str(out / "Results")
    cfg.model_dir = "/tmp/expfit_deploy_lab_models"
    cfg.partition.n_parts = args.parts
    sur = cfg.surrogate
    n_sync = sur.i_cri + 1
    block = sur.block_size
    se = 50
    cfg.solver.save_every = se
    num_steps = n_sync + args.blocks * block
    cfg.solver.num_steps = num_steps

    ctx = build_context(cfg, dtype=jnp.float32)
    sp, solver, maps = ctx.sp, ctx.solver, ctx.maps
    P, S3 = sp.n_parts, sp.sld.shape[1]
    state_dtype = sp.lM.dtype
    dt = float(ctx.prob.dt)
    rer = 1.0 / (dt * se)
    print(f"P={P} S3={S3} DL={sp.DL} fint={sp.fint_mode} "
          f"compensated={sp.compensated} dt={dt:.3e}")

    # fit expfit per rank on the stored traces (stage-3 equivalent)
    fits = []
    for r in range(P):
        with h5py.File(
            out / "Results" / "sol_on_shared" / f"rank={r}-shared_dof.hdf5"
        ) as f:
            tr = f["Displacement"][...].T
        cut = tr.shape[0] // 2
        mu, basis = modal_basis(tr[:cut], args.modal)
        params, _ = fit_expfit(
            to_modal(tr, mu, basis)[:cut], rer, order=sur.expfit_order
        )
        fits.append((params, mu, basis, tr))

    steps = np.arange(n_sync, num_steps, dtype=np.float64)
    K = args.modal
    coef_rows = np.zeros((P, len(steps), K), np.float32)
    for r, (params, mu, basis, _) in enumerate(fits):
        coef_rows[r] = eval_expfit(params, steps / se, rer).astype(
            np.float32
        )

    # modal pack + fmask exactly as run() builds them
    mu_np = np.zeros((P, S3))
    basis_np = np.zeros((P, K, S3))
    fmc = np.zeros((P, K), np.float32)
    fmask_v = np.zeros((P, S3), np.float32)
    for r, (_, mu, basis, _) in enumerate(fits):
        Dr = mu.shape[0]
        mu_np[r, :Dr] = mu
        basis_np[r, : basis.shape[0], :Dr] = basis
        fmc[r, : basis.shape[0]] = 1.0
        fmask_v[r, : 3 * len(maps.shared_nodes[r])] = 1.0
    dt_ = jnp.dtype(sur.dtype)
    modal_pack = (
        jnp.asarray(mu_np, dt_), jnp.asarray(basis_np, dt_),
        jnp.asarray(fmc, dt_),
    )
    fmask_v = jnp.asarray(fmask_v, dt_)

    W = sur.n_past * sur.filter_size
    runner = make_block_group_runner(
        solver, sur, block=block, se_run=se, state_dtype=state_dtype,
        W=W, modal=modal_pack, ens=1, expfit=True,
    )
    d0 = sp.localize(ctx.prob.d0)
    dn = sp.localize(ctx.prob.dn)
    (traj0, shared0), carry = solver.run_streamed(
        d0, dn, 0.0, n_sync, sync=True, record="all", save_every=se
    )
    hist_dev = jnp.asarray(np.asarray(shared0)[:, -W:], dtype=dt_)
    nb = args.blocks
    coefs_g = np.moveaxis(
        coef_rows.reshape(P, nb, block, K), 0, 1
    )
    d0c, dnc, tc = carry
    carry, hist_dev, trajs_g = runner(
        solver._data(), d0c, dnc, tc, hist_dev, 0.0,
        jnp.zeros((P,), state_dtype), jnp.zeros((P,), state_dtype),
        fmask_v, nb, coefs=coefs_g,
    )
    tg = np.asarray(jnp.moveaxis(trajs_g, 0, 1)).reshape(P, -1, sp.DL)

    # recorded slot j of the comm-free segment = scan step n_sync + j*se
    # -> coef index j*se; shared channels of the trajectory via sld
    sld = np.asarray(sp.sld)
    for r in (0, 7, 15):
        params, mu, basis, tr = fits[r]
        Dr = mu.shape[0]
        j = np.arange(tg.shape[1])
        dep = tg[r][:, sld[r, :Dr]]                       # (T_rec, Dr)
        fed = (
            coef_rows[r, j * se].astype(np.float64) @ basis + mu
        )
        tru = tr[n_sync // se + j]
        nrm = np.linalg.norm(tru)
        print(
            f"rank {r}: deployed-vs-fed {np.linalg.norm(dep - fed) / nrm:.3e}"
            f"  deployed-vs-truth {np.linalg.norm(dep - tru) / nrm:.3e}"
            f"  fed-vs-truth {np.linalg.norm(fed - tru) / nrm:.3e}"
        )
        e = np.linalg.norm(dep - fed, axis=1)
        print(f"   dep-vs-fed per-row (every 10): {e[::10].round(9)}")


if __name__ == "__main__":
    main()
