"""Pallas kernel equivalence (interpret mode on CPU; compiled numbers come
from benchmarks/sweep.py on TPU).

Oracles: the dense vmapped matvec for batched_fint_matvec, and the lax.scan
dense stepper for the VMEM-resident whole-scan kernel — both already
validated against the serial/NumPy oracles in test_sharded.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.ops import pallas_step
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import setup_problem


def _sharded(n_parts=2, nx=8, fint_mode="pallas"):
    cfg = Config()
    cfg.beam_cells = (nx, 1, 1)
    cfg.beam_extent = (float(nx), 1.0, 1.0)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode=fint_mode)
    return prob, maps, sp


def test_unknown_fint_mode_rejected():
    prob, maps, _ = _sharded(2, 8, "dense")
    with pytest.raises(ValueError, match="unknown fint_mode"):
        ShardedProblem.build(prob, maps, fint_mode="palas")  # typo


def test_pallas_padding_and_matvec_matches_dense():
    prob, maps, spp = _sharded(2, 8, "pallas")
    _, _, spd = _sharded(2, 8, "dense")
    assert spp.DL % pallas_step.TILE == 0
    rng = np.random.default_rng(0)
    d = np.zeros((spp.n_parts, spp.DL))
    d[:, : spd.DL] = rng.normal(size=(spd.n_parts, spd.DL))
    d[:, spd.DL - 1] = 0.0  # dummy slot
    d = d * np.asarray(spp.dof_mask)
    fp = np.asarray(spp._fint_stacked(jnp.asarray(d)))
    fd = np.asarray(spd._fint_stacked(jnp.asarray(d[:, : spd.DL])))
    assert np.allclose(fp[:, : spd.DL], fd, atol=1e-12)
    assert np.allclose(fp[:, spd.DL :], 0.0)


def test_pallas_exchanged_run_matches_dense():
    """fint_mode='pallas' as a full _fint_stacked branch: the exchanged
    (psum-semantics) run must match the dense run on the real slots."""
    prob, maps, spp = _sharded(2, 8, "pallas")
    _, _, spd = _sharded(2, 8, "dense")
    num_steps = 40
    sol_p = ShardedSolver(spp, mesh=None)
    sol_d = ShardedSolver(spd, mesh=None)
    (tp, _), _ = sol_p.run(
        spp.localize(prob.d0), spp.localize(prob.dn), 0.0, num_steps,
        sync=True,
    )
    (td, _), _ = sol_d.run(
        spd.localize(prob.d0), spd.localize(prob.dn), 0.0, num_steps,
        sync=True,
    )
    assert np.allclose(
        np.asarray(tp)[:, :, : spd.DL], np.asarray(td), atol=1e-12
    )


@pytest.mark.parametrize("cells", [(8, 1, 1), (25, 2, 2)])
def test_banded_whole_scan_kernel_matches_scan(cells):
    """The band-resident whole-scan kernel (ops/pallas_banded.py) must
    reproduce the lax.scan banded comm-free path. (25,2,2) gives nc=3
    chunks, exercising the sub/super-diagonal lanes; (8,1,1) is the
    single-chunk case."""
    cfg = Config()
    cfg.beam_cells = cells
    cfg.beam_extent = (float(cells[0]) / max(cells[1], 1), 1.0, 1.0)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="banded")
    solver = ShardedSolver(sp, mesh=None)
    d0 = sp.localize(prob.d0)
    dn = sp.localize(prob.dn)
    num_steps = 30

    # oracle: force the scan path via record="all"
    (_, _), carry_scan = solver.run(
        d0, dn, 0.0, num_steps, sync=False, record="all"
    )
    assert solver._banded_scan_ok(False, "none", None, None)
    (t_none, s_none), carry_k = solver.run(
        d0, dn, 0.0, num_steps, sync=False, record="none"
    )
    assert t_none is None and s_none is None
    for a, b in zip(carry_scan, carry_k):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_pallas_compensated_runs_and_matches_dense():
    """Regression (ADVICE r2): compensated mode reshaped DL-1 columns into
    (L, 3), which crashes at trace time when pallas pads DL to the kernel
    tile — every f32 pipeline run auto-enables compensated, so pallas +
    f32 was unusable. The translation mean must use the real DOF span."""
    cfg = Config()
    cfg.beam_cells = (8, 1, 1)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=jnp.float32)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    runs = {}
    for mode in ("pallas", "dense"):
        sp = ShardedProblem.build(
            prob, maps, fint_mode=mode, dtype=jnp.float32, compensated=True
        )
        if mode == "pallas":  # the crash requires (DL-1) % 3 != 0
            assert (sp.DL - 1) % 3 != 0
        solver = ShardedSolver(sp, mesh=None)
        (traj, _), _ = solver.run(
            sp.localize(prob.d0), sp.localize(prob.dn), 0.0, 25, sync=True,
        )
        runs[mode] = np.asarray(traj)
    DLd = runs["dense"].shape[-1]
    assert np.allclose(
        runs["pallas"][:, :, :DLd], runs["dense"], atol=1e-6
    )


def test_compensated_initial_dirichlet_clamped():
    """Regression (ADVICE r2): a nonzero initial value at a Dirichlet DOF
    must not persist — the plain path/reference zero d1 every step
    (Tools/Dynamic_solver.py:20); compensated clamps at carry build."""
    prob, maps, sp = _sharded(2, 8, "dense")
    spc = ShardedProblem.build(prob, maps, fint_mode="dense",
                               compensated=True)
    solver = ShardedSolver(spc, mesh=None)
    d0 = np.array(spc.localize(prob.d0))
    bc = np.asarray(spc.bc_mask)
    dirich = (np.asarray(spc.dof_mask) > 0) & (bc == 0)
    assert dirich.any()
    d0[dirich] = 7.5  # adversarial nonzero Dirichlet initial state
    (traj, _), _ = solver.run(
        jnp.asarray(d0), spc.localize(prob.dn), 0.0, 10, sync=True,
    )
    assert np.allclose(np.asarray(traj)[:, -1][dirich], 0.0)


def test_pallas_whole_scan_kernel_matches_scan():
    """The VMEM-resident whole-scan kernel must reproduce the lax.scan
    comm-free path: final carry, shared trace, and the NN-overwrite
    (one-hot scatter) semantics."""
    prob, maps, spp = _sharded(2, 8, "pallas")
    num_steps = 30
    solver = ShardedSolver(spp, mesh=None)
    d0 = spp.localize(prob.d0)
    dn = spp.localize(prob.dn)

    # oracle: force the scan path by asking for record="all"
    (traj, shared_scan), carry_scan = solver.run(
        d0, dn, 0.0, num_steps, sync=False, record="all"
    )

    assert solver._pallas_scan_ok(False, "shared", 1, num_steps)
    (traj_k, shared_k), carry_k = solver.run(
        d0, dn, 0.0, num_steps, sync=False, record="shared"
    )
    assert traj_k is None
    assert np.allclose(
        np.asarray(shared_k), np.asarray(shared_scan), atol=1e-12
    )
    for a, b in zip(carry_scan, carry_k):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    # with preds: feeding the exchanged run's true shared rows must
    # reproduce the exchanged trajectory (perfect-prediction identity)
    (_, shared_true), _ = solver.run(d0, dn, 0.0, num_steps, sync=True,
                                     record="shared")
    (_, shared_pred_k), carry_pk = solver.run(
        d0, dn, 0.0, num_steps, sync=False, preds=shared_true,
        record="shared",
    )
    (_, shared_pred_s), carry_ps = solver.run(
        d0, dn, 0.0, num_steps, sync=False, preds=shared_true,
        record="all",
    )
    assert np.allclose(
        np.asarray(shared_pred_k), np.asarray(shared_pred_s), atol=1e-12
    )
    for a, b in zip(carry_pk, carry_ps):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-12)
