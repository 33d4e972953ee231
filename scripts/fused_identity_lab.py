"""Exact-feed identity through the FUSED block-group runner.

The noise-transfer study proved the per-block solver.run path has a
0.000% closed-loop floor when fed the true shared rows. The expfit
deployment (runs/scale_96, r3) showed deployed shared rows diverging
from the (host-verified-correct) fed predictions by a growing,
saturating error — implicating the fused stage-4 executor itself, i.e.
make_block_group_runner, which ALL stacked stage-4 runs use.

Protocol (CPU, deployment-like: f32 state, compensated auto, real
3000-step schedule, save_every>1):
  1. exchanged reference run, record shared rows + trajectory;
  2. drive the fused runner with expfit=True, modal=None and
     coef_rows = the true shared rows (the perfect predictor);
  3. compare trajectories at recorded slots.
Identity holds => the fused path is clean and the bug is expfit-feed-
specific; a gap here reproduces the deployment bug in minutes on CPU.

Usage: JAX_PLATFORMS=cpu python scripts/fused_identity_lab.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from savtpu.config import Config
    from savtpu.pipeline.common import build_context
    from savtpu.pipeline.online_predictor import make_block_group_runner

    cfg = Config()
    cfg.workdir = "/tmp/fused_identity/Results"
    cfg.model_dir = "/tmp/fused_identity/models"
    cfg.beam_cells = (24, 2, 2)
    cfg.beam_extent = (12.0, 1.0, 1.0)
    cfg.partition.n_parts = 4
    num_steps = 9000
    cfg.solver.num_steps = num_steps
    cfg.solver.save_every = 50
    sur = cfg.surrogate
    n_sync = sur.i_cri + 1          # 3000
    block = sur.block_size          # 3000
    se = cfg.solver.save_every

    ctx = build_context(cfg, dtype=jnp.float32)
    sp, solver = ctx.sp, ctx.solver
    P = sp.n_parts
    S3 = sp.sld.shape[1]
    state_dtype = sp.lM.dtype
    print(f"P={P} S3={S3} DL={sp.DL} dtype={state_dtype} "
          f"compensated={sp.compensated}")

    d0 = sp.localize(ctx.prob.d0)
    dn = sp.localize(ctx.prob.dn)

    # exchanged reference: full run, shared rows at full resolution
    (traj_ref, shared_ref), _ = solver.run(
        d0, dn, 0.0, num_steps, sync=True, record="all", save_every=se
    )
    traj_ref = np.asarray(traj_ref)
    shared_ref = np.asarray(shared_ref)          # (P, T, S3)

    # fused path fed the true rows as "expfit coefficients" (raw feed)
    W = sur.n_past * sur.filter_size
    fmask_v = np.zeros((P, S3), np.float32)
    for r in range(P):
        fmask_v[r, : 3 * len(ctx.maps.shared_nodes[r])] = 1.0
    fmask_v = jnp.asarray(fmask_v)
    runner = make_block_group_runner(
        solver, sur, block=block, se_run=se, state_dtype=state_dtype,
        W=W, modal=None, ens=1, expfit=True,
    )
    (traj0, shared0), carry = solver.run_streamed(
        d0, dn, 0.0, n_sync, sync=True, record="all", save_every=se
    )
    hist_dev = jnp.asarray(
        np.asarray(shared0)[:, -W:], dtype=jnp.dtype(sur.dtype)
    )
    coef_rows = shared_ref[:, n_sync:, :].astype(np.float32)
    nb = (num_steps - n_sync) // block
    coefs_g = np.moveaxis(
        coef_rows[:, : nb * block].reshape(P, nb, block, -1), 0, 1
    )
    d0c, dnc, tc = carry
    carry, hist_dev, trajs_g = runner(
        solver._data(), d0c, dnc, tc, hist_dev, 0.0,
        jnp.zeros((P,), state_dtype), jnp.zeros((P,), state_dtype),
        fmask_v, nb, coefs=coefs_g,
    )
    tg = jnp.moveaxis(trajs_g, 0, 1)
    traj_fused = np.concatenate(
        [np.asarray(traj0), np.asarray(tg).reshape(P, -1, sp.DL)], axis=1
    )

    ref_n = float(np.linalg.norm(traj_ref))
    err = float(np.linalg.norm(traj_fused - traj_ref) / ref_n)
    print(f"exact-feed fused-vs-exchanged rel-L2 = {err:.3e}")
    # per-segment profile: where does it diverge?
    T = traj_ref.shape[1]
    for a in range(0, T, T // 6):
        b = min(a + T // 6, T)
        e = np.linalg.norm(traj_fused[:, a:b] - traj_ref[:, a:b])
        d = max(np.linalg.norm(traj_ref[:, a:b]), 1e-30)
        print(f"  rows {a:4d}:{b:4d}  rel {e / d:.3e}")


if __name__ == "__main__":
    main()
