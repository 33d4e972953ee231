"""Band-resident ONLINE whole-scan kernel (ops/pallas_banded._online_kernel).

The production stage-4 comm-free block — compensated double-word state,
per-step prediction overwrite (Online_predictor.py:298), full shared +
strided trajectory recording — runs through a VMEM-resident pallas kernel
when the band fits. It must agree with the lax.scan compensated branch of
``ShardedProblem.stacked_run`` it mirrors; the only tolerated deviation is
the band matvec's different f.p. summation order, so the f64 comparison is
tight (~1e-12) and the f32 one tolerance-level.
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


def _sharded_banded(dtype):
    cfg = Config()
    cfg.beam_cells = (12, 2, 2)
    cfg.beam_extent = (6.0, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=dtype)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 4, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode="banded", dtype=dtype, compensated=True
    )
    return prob, sp


def _preds(sp, steps, dtype, seed=0):
    """Smooth synthetic shared-DOF rows (sinusoids per slot)."""
    rng = np.random.default_rng(seed)
    P, S3 = sp.sld.shape
    t = np.arange(steps)[None, :, None]
    amp = rng.uniform(0.01, 0.05, (P, 1, S3))
    w = rng.uniform(0.001, 0.01, (P, 1, S3))
    return jnp.asarray(amp * np.sin(w * t), dtype=dtype)


@pytest.mark.parametrize(
    "save_every,steps",
    [
        (1, 60),    # t_tile=1 (no multiple-of-8 divisor of 60)
        (5, 60),
        (5, 320),   # t_tile=160: exercises the batched multi-tile path
    ],
)
def test_online_kernel_matches_scan_f64(save_every, steps, monkeypatch):
    dtype = jnp.float64
    prob, sp = _sharded_banded(dtype)
    preds = _preds(sp, steps, dtype)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)

    assert sp._online_pallas_ok(
        False, preds, None, "all", save_every, steps, dtype
    )
    (traj_k, sh_k), carry_k = sp.stacked_run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=save_every,
    )

    monkeypatch.setattr(
        ShardedProblem, "_online_pallas_ok",
        lambda self, *a, **k: False,
    )
    (traj_s, sh_s), carry_s = sp.stacked_run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=save_every,
    )

    assert traj_k.shape == traj_s.shape
    assert sh_k.shape == sh_s.shape
    nt = np.linalg.norm(np.asarray(traj_s))
    assert np.linalg.norm(np.asarray(traj_k) - np.asarray(traj_s)) <= 1e-11 * max(nt, 1e-30)
    ns = np.linalg.norm(np.asarray(sh_s))
    assert np.linalg.norm(np.asarray(sh_k) - np.asarray(sh_s)) <= 1e-11 * max(ns, 1e-30)
    for ck, cs in zip(carry_k[:2], carry_s[:2]):
        nc_ = np.linalg.norm(np.asarray(cs))
        assert np.linalg.norm(np.asarray(ck) - np.asarray(cs)) <= 1e-11 * max(nc_, 1e-30)
    assert float(carry_k[2]) == pytest.approx(float(carry_s[2]), rel=1e-12)


def test_online_kernel_matches_scan_f32(monkeypatch):
    dtype = jnp.float32
    prob, sp = _sharded_banded(dtype)
    steps = 40
    preds = _preds(sp, steps, dtype)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj_k, sh_k), _ = sp.stacked_run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=1,
    )
    monkeypatch.setattr(
        ShardedProblem, "_online_pallas_ok",
        lambda self, *a, **k: False,
    )
    (traj_s, sh_s), _ = sp.stacked_run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=1,
    )
    nt = np.linalg.norm(np.asarray(traj_s))
    assert np.linalg.norm(np.asarray(traj_k) - np.asarray(traj_s)) <= 2e-4 * max(nt, 1e-30)
    assert np.isfinite(np.asarray(traj_k)).all()


def test_online_kernel_subchunking_matches_single(monkeypatch):
    """Forcing a small sub-chunk must give the same answer as one chunk
    (the carry between kernel calls is exact)."""
    dtype = jnp.float64
    prob, sp = _sharded_banded(dtype)
    steps = 60
    preds = _preds(sp, steps, dtype)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj_a, sh_a), carry_a = sp.stacked_run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=5,
    )
    monkeypatch.setattr(
        ShardedProblem, "_online_chunk_len",
        lambda self, num_steps, save_every: 20,
    )
    (traj_b, sh_b), carry_b = sp.stacked_run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=5,
    )
    assert np.array_equal(np.asarray(traj_a), np.asarray(traj_b))
    assert np.array_equal(np.asarray(sh_a), np.asarray(sh_b))
    assert np.array_equal(np.asarray(carry_a[0]), np.asarray(carry_b[0]))


def test_online_kernel_under_device_mesh():
    """The production stage-4 configuration (banded + compensated +
    per-step overwrite + full recording) executing INSIDE shard_map over
    an 8-virtual-device mesh must match the single-device emulation to
    1e-12 (VERDICT r3 #6 — previously only the dense fused block group
    was dryrun under a mesh)."""
    from savtpu.parallel import make_device_mesh
    from savtpu.parallel.sharded import ShardedSolver

    dtype = jnp.float64
    cfg = Config()
    cfg.beam_cells = (16, 2, 2)
    cfg.beam_extent = (8.0, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=dtype)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 8, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode="banded", dtype=dtype, compensated=True
    )
    steps, save_every = 60, 5
    preds = _preds(sp, steps, dtype)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    assert sp._online_pallas_ok(
        False, preds, None, "all", save_every, steps, dtype
    )
    (traj_e, sh_e), carry_e = ShardedSolver(sp, mesh=None).run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=save_every,
    )
    (traj_m, sh_m), carry_m = ShardedSolver(sp, mesh=make_device_mesh(8)).run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=save_every,
    )
    nt = np.linalg.norm(np.asarray(traj_e))
    assert np.linalg.norm(np.asarray(traj_m) - np.asarray(traj_e)) <= 1e-12 * max(nt, 1e-30)
    ns = np.linalg.norm(np.asarray(sh_e))
    assert np.linalg.norm(np.asarray(sh_m) - np.asarray(sh_e)) <= 1e-12 * max(ns, 1e-30)
    for cm, ce in zip(carry_m[:2], carry_e[:2]):
        nc_ = np.linalg.norm(np.asarray(ce))
        assert np.linalg.norm(np.asarray(cm) - np.asarray(ce)) <= 1e-12 * max(nc_, 1e-30)
