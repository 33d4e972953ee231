"""exchange_mode="grid": structured face-plane halo exchange.

On a box partition with lexicographic local node order, the shared-DOF
reduction is a dimension-split sum of overlapping box face planes — zero
gather/scatter (the XLA scatter-class floor measured in docs/STATUS_r3.md
does not apply). Must match the psum exchange's trajectories to rounding
on every fint mode (same contract: Tools/Distributed_tools.py:77-93).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.ops.material import NeoHookean
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import setup_problem


def _setup(cells=(8, 4, 2), n_parts=8):
    cfg = Config()
    cfg.beam_cells = cells
    cfg.beam_extent = tuple(float(c) for c in cells)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method="box"
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    return prob, maps


@pytest.mark.parametrize("fint_mode", ["dense", "banded"])
def test_grid_matches_psum_trajectory(fint_mode):
    """Multi-axis box grid (the (4,2,1) factorization of 8 over 8x4x2
    cells) so the x, y face passes and their shared edges are all
    exercised."""
    prob, maps = _setup()
    sps = {}
    for ex in ("psum", "grid"):
        sps[ex] = ShardedProblem.build(
            prob, maps, fint_mode=fint_mode, exchange_mode=ex,
        )
    steps = 100
    out = {}
    for ex, sp in sps.items():
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, steps, sync=True)
        out[ex] = np.stack(
            [
                sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
                for t in range(0, steps, 25)
            ]
        )
    scale = max(np.abs(out["psum"]).max(), 1e-30)
    err = np.abs(out["psum"] - out["grid"]).max() / scale
    assert err < 1e-9, err


def test_grid_three_axis_corners_exact():
    """3-axis factorization (4x2x2 boxes over 8x4x4 cells — the shape
    class of the 384^3/256 production 16x4x4 grid): corner nodes shared
    by EIGHT parts must hold the full 8-owner sum after the x, y, z
    passes (pairs -> quads -> octets)."""
    prob, maps = _setup(cells=(8, 4, 4), n_parts=16)
    sp_p = ShardedProblem.build(prob, maps, exchange_mode="psum")
    sp_g = ShardedProblem.build(prob, maps, exchange_mode="grid")
    rng = np.random.default_rng(1)
    fg = rng.normal(size=(prob.ndof,))
    ep = np.asarray(sp_p._exchange(sp_p.localize(fg), lambda x: x))
    eg = np.asarray(sp_g._exchange_grid(sp_g.localize(fg)))
    gp = sp_p.globalize(ep, prob.ndof)
    gg = sp_g.globalize(eg, prob.ndof)
    assert np.allclose(gp, gg, rtol=0, atol=1e-12 * np.abs(gp).max())


def test_grid_single_exchange_exact():
    """One exchange application on random forces: every owner's copy of a
    shared DOF holds the full owner sum, interior DOFs untouched."""
    prob, maps = _setup()
    sp_p = ShardedProblem.build(prob, maps, exchange_mode="psum")
    sp_g = ShardedProblem.build(prob, maps, exchange_mode="grid")
    rng = np.random.default_rng(0)
    # same physical per-DOF forces localized through each build's maps
    fg = rng.normal(size=(prob.ndof,))
    Fp = sp_p.localize(fg)
    Fg = sp_g.localize(fg)
    # localize duplicates shared DOFs; the exchange sums them
    ep = np.asarray(sp_p._exchange(Fp, lambda x: x))
    eg = np.asarray(sp_g._exchange_grid(Fg))
    gp = sp_p.globalize(ep, prob.ndof)
    gg = sp_g.globalize(eg, prob.ndof)
    assert np.allclose(gp, gg, rtol=0, atol=1e-12 * np.abs(gp).max())


def test_grid_with_nh_stencil():
    """grid exchange + stencil NH forces (the box-native fast pair)."""
    prob, maps = _setup()
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    sp_p = ShardedProblem.build(
        prob, maps, material=mat, exchange_mode="psum"
    )
    sp_g = ShardedProblem.build(
        prob, maps, material=mat, exchange_mode="grid"
    )
    assert sp_g.nhs_dims is not None
    steps = 60
    out = {}
    for key, sp in (("p", sp_p), ("g", sp_g)):
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, steps, sync=True)
        out[key] = sp.globalize(np.asarray(traj)[:, -1, :], prob.ndof)
    scale = max(np.abs(out["p"]).max(), 1e-30)
    assert np.abs(out["p"] - out["g"]).max() / scale < 1e-9


def test_grid_rejects_nonbox_partition():
    cfg = Config()
    cfg.beam_cells = (7, 2, 2)
    cfg.beam_extent = (7.0, 2.0, 2.0)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 3, method="graph"
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    from savtpu.parallel import stencil

    if stencil.detect_box_partition(prob.mesh, maps) is not None:
        pytest.skip("graph partition happened to be box-aligned")
    with pytest.raises(ValueError, match="grid"):
        ShardedProblem.build(prob, maps, exchange_mode="grid")


def test_grid_under_device_mesh_matches_emulated():
    """The production grid exchange under shard_map on 8 virtual devices
    (one part per device): each axis pass ppermutes face planes between
    box-neighbor devices (_exchange_grid_mesh). Must equal the
    single-device emulation bit-for-bit, on both the plain and the
    compensated step, and with stencil fint (the 384^3 production
    pairing)."""
    from savtpu.parallel.sharded import make_device_mesh

    prob, maps = _setup(cells=(8, 4, 4), n_parts=8)  # 2x2x2 boxes
    for fint_mode, compensated in (("dense", False), ("stencil", True)):
        sp = ShardedProblem.build(
            prob, maps, fint_mode=fint_mode, exchange_mode="grid",
            compensated=compensated,
        )
        d0 = sp.localize(prob.d0)
        dnl = sp.localize(prob.dn)
        (te, she), _ = ShardedSolver(sp, mesh=None).run(
            d0, dnl, 0.0, 40, sync=True
        )
        (tm, shm), _ = ShardedSolver(sp, mesh=make_device_mesh(8)).run(
            d0, dnl, 0.0, 40, sync=True
        )
        assert np.allclose(np.asarray(te), np.asarray(tm), atol=1e-12), (
            fint_mode, compensated,
        )
        assert np.allclose(np.asarray(she), np.asarray(shm), atol=1e-12)

    # multiple parts per device must be rejected
    sp = ShardedProblem.build(prob, maps, exchange_mode="grid")
    with pytest.raises(ValueError, match="one part per device"):
        ShardedSolver(sp, mesh=make_device_mesh(4))


def test_grid_under_device_mesh_periodic_tube():
    """The theta-periodic tube's seam pair rides the wrapped y ppermute
    ring under the device mesh."""
    from savtpu.mesh import tube_mesh
    from savtpu.parallel.sharded import make_device_mesh
    from savtpu.solvers import setup_problem as _setup_problem

    cfg = Config()
    mesh = tube_mesh(n_r=1, n_theta=8, n_z=4)
    prob = _setup_problem(cfg, mesh=mesh)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 8, method="box"
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points, axis=2)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    sp = ShardedProblem.build(prob, maps, exchange_mode="grid")
    assert sp.grid_wrap  # the seam pair must actually be exercised
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (te, _), _ = ShardedSolver(sp, mesh=None).run(d0, dnl, 0.0, 40, sync=True)
    (tm, _), _ = ShardedSolver(sp, mesh=make_device_mesh(8)).run(
        d0, dnl, 0.0, 40, sync=True
    )
    assert np.allclose(np.asarray(te), np.asarray(tm), atol=1e-12)
