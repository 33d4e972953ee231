"""Compensated (double-word) time integration.

The f32 explicit trajectory has an intrinsic noise floor: ulp(d)-level
state-roll rounding accumulates resonantly through the near-undamped modes
(docs/PRECISION.md §3). ``compensated=True`` carries the scan state as an
unevaluated (hi, lo) float pair with error-free TwoSum accumulation, which
must (a) be algebraically identical to the plain stepper (reference update
formula, Tools/Dynamic_solver.py:17) and (b) push the f32 trajectory far
below the plain-f32 drift from the f64 truth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import setup_problem


def _sharded(nx=8, n_parts=2, dtype=jnp.float64, compensated=False):
    cfg = Config()
    cfg.beam_cells = (nx, 1, 1)
    cfg.beam_extent = (float(nx), 1.0, 1.0)
    prob = setup_problem(cfg, dtype=dtype)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode="dense", dtype=dtype, compensated=compensated
    )
    return prob, sp, ShardedSolver(sp)


def _run(prob, sp, solver, steps, save_every=1, preds=None):
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj, shared), carry = solver.run(
        d0, dnl, 0.0, steps,
        sync=preds is None, preds=preds, record="all",
        save_every=save_every,
    )
    return np.asarray(traj), np.asarray(shared), carry


@pytest.mark.parametrize("save_every", [1, 5])
def test_compensated_matches_plain_f64(save_every):
    steps = 150
    prob, sp_p, sol_p = _sharded(compensated=False)
    _, sp_c, sol_c = _sharded(compensated=True)
    tp, _, cp = _run(prob, sp_p, sol_p, steps, save_every)
    tc, _, cc = _run(prob, sp_c, sol_c, steps, save_every)
    scale = max(np.abs(tp).max(), 1e-30)
    assert np.abs(tp - tc).max() / scale < 1e-12
    # lowered carry (d1, d0, t) agrees too
    for a, b in zip(cp, cc):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_compensated_overwrite_matches_plain_f64():
    steps = 120
    prob, sp_p, sol_p = _sharded(compensated=False)
    _, sp_c, sol_c = _sharded(compensated=True)
    # drive the comm-free mode with an arbitrary smooth prescribed
    # shared-DOF signal (the NN-overwrite path, Online_predictor.py:298)
    S3 = int(sp_p.sld.shape[1])
    t = np.linspace(0, 1, steps)[None, :, None]
    preds = jnp.asarray(
        1e-3 * np.sin(2 * np.pi * t + np.arange(S3)[None, None, :])
        * np.ones((sp_p.n_parts, 1, 1))
    )
    tp, shp, _ = _run(prob, sp_p, sol_p, steps, preds=preds)
    tc, shc, _ = _run(prob, sp_c, sol_c, steps, preds=preds)
    scale = max(np.abs(tp).max(), 1e-30)
    assert np.abs(tp - tc).max() / scale < 1e-12
    # the overwrite lands exactly: recorded shared rows == preds
    sm = np.asarray(sp_c.smask)[:, None, :]
    assert np.abs((shc - np.asarray(preds)) * sm).max() < 1e-9


@pytest.mark.parametrize("compensated", [False, True])
def test_blend_endpoints(compensated):
    """blend=1 must equal the pure exchanged run; blend=0 must equal the
    comm-free overwrite run (the quasi-static-release resync ramp's two
    endpoints)."""
    steps = 80
    prob, sp, sol = _sharded(compensated=compensated)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (t_sync, sh_sync), _ = sol.run(d0, dnl, 0.0, steps, sync=True)
    S3 = int(sp.sld.shape[1])
    t = np.linspace(0, 1, steps)[None, :, None]
    preds = jnp.asarray(
        1e-3 * np.sin(2 * np.pi * t + np.arange(S3)[None, None, :])
        * np.ones((sp.n_parts, 1, 1))
    )
    ones = jnp.ones((steps,))
    (t_b1, _), _ = sol.run(
        d0, dnl, 0.0, steps, sync=True, preds=preds, blend=ones
    )
    assert np.allclose(np.asarray(t_b1), np.asarray(t_sync), atol=1e-12)
    (t_ov, _), _ = sol.run(d0, dnl, 0.0, steps, sync=False, preds=preds)
    (t_b0, _), _ = sol.run(
        d0, dnl, 0.0, steps, sync=False, preds=preds, blend=ones * 0.0
    )
    assert np.allclose(np.asarray(t_b0), np.asarray(t_ov), atol=1e-12)


def test_compensated_shard_map_matches_emulation():
    import jax

    from savtpu.parallel import make_device_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    steps = 60
    prob, sp, _ = _sharded(n_parts=4, compensated=True)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (te, _), ce = ShardedSolver(sp, mesh=None).run(
        d0, dnl, 0.0, steps, sync=True
    )
    (tm, _), cm = ShardedSolver(sp, mesh=make_device_mesh(4)).run(
        d0, dnl, 0.0, steps, sync=True
    )
    assert np.allclose(np.asarray(te), np.asarray(tm), atol=1e-12)
    for a, b in zip(ce, cm):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_compensated_lifts_f32_floor():
    """f32 drift from the f64 trajectory: compensated must beat plain by
    a large factor once the accumulation noise dominates (>=10k steps)."""
    steps = 20_000
    prob64, sp64, sol64 = _sharded(dtype=jnp.float64)
    d064 = sp64.localize(prob64.d0)
    dn64 = sp64.localize(prob64.dn)
    (_, _), carry64 = sol64.run(
        d064, dn64, 0.0, steps, sync=True, record="none"
    )
    ref = np.asarray(carry64[0])

    errs = {}
    for comp in (False, True):
        prob, sp, sol = _sharded(dtype=jnp.float32, compensated=comp)
        d0 = sp.localize(prob.d0)
        dnl = sp.localize(prob.dn)
        (_, _), carry = sol.run(d0, dnl, 0.0, steps, sync=True,
                                record="none")
        d = np.asarray(carry[0], np.float64)
        errs[comp] = np.linalg.norm(d - ref) / np.linalg.norm(ref)
    # plain f32 sits on the rounding floor; compensated (TwoSum state roll
    # + translation-nullspace-preserving matvec) measured ~170x below it
    # on this problem; assert a conservative 20x
    assert errs[True] < errs[False] / 20.0, errs
