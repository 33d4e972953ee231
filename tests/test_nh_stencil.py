"""Structured-box stencil Neo-Hookean force path (parallel/stencil.py).

The stencil kernel must (a) activate on box-aligned partitions of the
structured Kuhn beam generator, (b) reproduce the generic gather path's
forces and trajectories to rounding, and (c) silently fall back for
meshes/partitions it cannot represent (the reference contract is
arbitrary tet meshes, Tools/Mat_construction.py:79-119 — the stencil is
a fast path on top, never a behavior change).
"""

import numpy as np
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.ops.material import NeoHookean
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.parallel import stencil
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import setup_problem


def _problem(cells=(8, 2, 2)):
    cfg = Config()
    cfg.beam_cells = cells
    cfg.beam_extent = tuple(float(c) for c in cells)
    return cfg, setup_problem(cfg)


def _maps(prob, n_parts, method="slab"):
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method=method
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    return build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )


def test_detect_structured_and_box():
    cfg, prob = _problem((8, 2, 2))
    s = stencil.detect_structured(prob.mesh)
    assert s is not None
    nx, ny, nz, spacing = s
    assert (nx, ny, nz) == (8, 2, 2)
    assert np.allclose(spacing, 1.0)
    box = stencil.detect_box_partition(prob.mesh, _maps(prob, 4))
    assert box is not None
    assert box.node_dims == (3, 3, 3)  # 2x2x2 cells per slab part


def test_detect_rejects_perturbed_mesh():
    cfg, prob = _problem((4, 2, 2))
    prob.mesh.points[5] += 0.01  # break uniform spacing/lattice
    assert stencil.detect_structured(prob.mesh) is None


@pytest.mark.parametrize("n_parts", [2, 4])
def test_stencil_matches_gather_trajectory(n_parts):
    cfg, prob = _problem((8, 2, 2))
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    maps = _maps(prob, n_parts)
    # nh_gather='incident' pins the original gather path: the windowed
    # one-hot default reassociates the per-node force sums (~2e-14 rel),
    # and its own equality test lives in test_nh_window.py
    sp_g = ShardedProblem.build(
        prob, maps, material=mat, nh_stencil="off", nh_gather="incident"
    )
    sp_s = ShardedProblem.build(prob, maps, material=mat, nh_stencil="auto")
    assert sp_g.nhs_dims is None
    assert sp_s.nhs_dims is not None, "stencil did not activate"
    # single evaluation: identical math, different arithmetic layout —
    # rounding-level agreement (measured ~3e-16 at this size)
    rng = np.random.default_rng(0)
    dg = rng.normal(size=(prob.ndof,)) * 1e-3
    fg = sp_g.globalize(
        np.asarray(sp_g._fint_stacked(sp_g.localize(dg))), prob.ndof
    )
    fs = sp_s.globalize(
        np.asarray(sp_s._fint_stacked(sp_s.localize(dg))), prob.ndof
    )
    assert np.abs(fg - fs).max() / np.abs(fg).max() < 1e-14
    steps = 100
    out = {}
    for key, sp in (("g", sp_g), ("s", sp_s)):
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, steps, sync=True)
        # globalize each saved step (the two builds use different local
        # node orders — lexicographic vs first-touch)
        out[key] = np.stack(
            [
                sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
                for t in range(0, steps, 20)
            ]
        )
    # trajectory: rounding differences amplify through the explicit
    # stepper — same bound the serial-oracle NH test uses
    scale = max(np.abs(out["g"]).max(), 1e-30)
    err = np.abs(out["g"] - out["s"]).max() / scale
    assert err < 1e-9, err


def test_stencil_comm_free_identity():
    """Perfect-prediction overwrite == synced run, on the stencil path
    (the sync-avoiding mode the NH scale runs use)."""
    cfg, prob = _problem((8, 2, 2))
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    sp = ShardedProblem.build(prob, _maps(prob, 4), material=mat)
    assert sp.nhs_dims is not None
    d0 = sp.localize(prob.d0)
    dn = sp.localize(prob.dn)
    steps = 60
    (ts, shared_true), _ = ShardedSolver(sp).run(d0, dn, 0.0, steps, sync=True)
    (tm, _), _ = ShardedSolver(sp).run(
        d0, dn, 0.0, steps, sync=False, preds=shared_true
    )
    assert np.allclose(np.asarray(tm), np.asarray(ts), atol=1e-12)


def test_unaligned_partition_falls_back():
    """A graph partition generally does not produce equal boxes — build
    must fall back to the gather path and still run."""
    cfg, prob = _problem((6, 2, 2))
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    maps = _maps(prob, 4, method="graph")
    sp = ShardedProblem.build(prob, maps, material=mat, nh_stencil="auto")
    if sp.nhs_dims is not None:
        pytest.skip("graph partition happened to be box-aligned")
    d0 = sp.localize(prob.d0)
    dn = sp.localize(prob.dn)
    (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, 20, sync=True)
    assert np.isfinite(np.asarray(traj)).all()


def test_box_partition_method():
    """partition method="box": equal congruent boxes on structured
    meshes (stencil-NH-eligible), minimal-cut divisible factorization,
    RCB fallback off-grid."""
    from savtpu.parallel.partition import partition_elements

    cfg, prob = _problem((12, 4, 2))
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 8, "box")
    sizes = np.bincount(epart)
    assert sizes.min() == sizes.max() == len(prob.mesh.tetra) // 8
    maps = _maps(prob, 8, method="box")
    box = stencil.detect_box_partition(prob.mesh, maps)
    assert box is not None
    # smallest-interface factorization of 8 over (12, 4, 2) cells is
    # (4, 2, 1): area = 3*4*2 + 1*12*2 + 0 = 48
    assert box.node_dims == (4, 3, 3)
    # off-grid mesh falls back to RCB (still a valid partition)
    prob.mesh.points[3] += 0.01
    epart2 = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 8, "box"
    )
    assert np.bincount(epart2).sum() == len(prob.mesh.tetra)
    assert len(np.unique(epart2)) == 8
