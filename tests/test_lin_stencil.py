"""fint_mode="stencil": gather-free linear internal forces on box grids.

The linear analogue of the stencil Neo-Hookean path: F_int = K d
recomputed each step from shifted corner views with the small-strain
stress law (reference element contract Tools/commons.py:15-41 +
Tools/Mat_construction.py:79-119). Must equal the pre-assembled Ke
matvec to roundoff and reproduce the exchanged/comm-free trajectories
of every other fint mode; generic modes remain the unstructured-mesh
contract (stencil raises on ineligible partitions rather than silently
changing results).
"""

import numpy as np
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


def _setup(cells=(8, 4, 2), n_parts=8, method="box"):
    cfg = Config()
    cfg.beam_cells = cells
    cfg.beam_extent = tuple(float(c) for c in cells)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method=method
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    return prob, maps


def test_stencil_force_matches_ebe():
    """Single unsynced force evaluation vs the generic per-element Ke
    path: identical math, different arithmetic layout (measured ~1e-15
    at this size in f64)."""
    prob, maps = _setup()
    sp_e = ShardedProblem.build(prob, maps, fint_mode="ebe")
    sp_s = ShardedProblem.build(prob, maps, fint_mode="stencil")
    assert sp_s.nhs_dims is not None
    rng = np.random.default_rng(0)
    dg = rng.normal(size=(prob.ndof,)) * 1e-3
    fe = sp_e.globalize(
        np.asarray(sp_e._fint_stacked(sp_e.localize(dg))), prob.ndof
    )
    fs = sp_s.globalize(
        np.asarray(sp_s._fint_stacked(sp_s.localize(dg))), prob.ndof
    )
    scale = max(np.abs(fe).max(), 1e-30)
    assert np.abs(fe - fs).max() / scale < 1e-12


@pytest.mark.parametrize("exchange", ["psum", "grid"])
def test_stencil_exchanged_trajectory(exchange):
    """100 exchanged steps, stencil forces (+ grid exchange for the
    production box-native pair) vs the dense/psum oracle."""
    prob, maps = _setup()
    sp_o = ShardedProblem.build(prob, maps, fint_mode="dense")
    sp_s = ShardedProblem.build(
        prob, maps, fint_mode="stencil", exchange_mode=exchange
    )
    steps = 100
    out = {}
    for key, sp in (("o", sp_o), ("s", sp_s)):
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, steps, sync=True)
        out[key] = np.stack(
            [
                sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
                for t in range(0, steps, 25)
            ]
        )
    scale = max(np.abs(out["o"]).max(), 1e-30)
    assert np.abs(out["o"] - out["s"]).max() / scale < 1e-9


def test_stencil_comm_free_trajectory():
    """sync=False (the sync-avoiding scan body) matches dense comm-free."""
    prob, maps = _setup(cells=(8, 4, 4), n_parts=16)
    sp_o = ShardedProblem.build(prob, maps, fint_mode="dense")
    sp_s = ShardedProblem.build(prob, maps, fint_mode="stencil")
    steps = 60
    out = {}
    for key, sp in (("o", sp_o), ("s", sp_s)):
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(
            d0, dn, 0.0, steps, sync=False
        )
        out[key] = sp.globalize(np.asarray(traj)[:, -1, :], prob.ndof)
    scale = max(np.abs(out["o"]).max(), 1e-30)
    assert np.abs(out["o"] - out["s"]).max() / scale < 1e-9


def test_stencil_rejects_nonbox_partition():
    prob, maps = _setup(cells=(7, 2, 2), n_parts=3, method="graph")
    from savtpu.parallel import stencil

    if stencil.detect_box_partition(prob.mesh, maps) is not None:
        pytest.skip("graph partition happened to be box-aligned")
    with pytest.raises(ValueError, match="stencil"):
        ShardedProblem.build(prob, maps, fint_mode="stencil")
