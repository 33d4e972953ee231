"""Windowed one-hot MXU gather/scatter for unstructured Neo-Hookean
forces (sharded.py _nh_fint_window — VERDICT r4 #2).

The reference assembles per-element forces over ARBITRARY tet meshes in
a Python loop (Tools/Mat_construction.py:79-119); savtpu's structured
fast paths don't apply there, and the r4 incident-gather fallback ran at
the serial-gather floor. The window path must match the incident path
exactly (same math, different assembly) on genuinely irregular
partitions and meshes.
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


def _problem(cells=(12, 3, 3)):
    cfg = Config()
    cfg.beam_cells = cells
    cfg.beam_extent = (float(cells[0]) / 2, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=jnp.float32)
    dnodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    m = cfg.material
    mat = NeoHookean.from_engineering(m.E, m.nu, m.rho, m.fz)
    return prob, dnodes, mat


def _global_forces(sp, gd):
    d = sp.localize(gd)
    F = np.asarray(sp._fint_stacked(d))
    mk = np.asarray(sp.dof_mask)
    ldg = np.asarray(sp.local_dofs_global)
    acc = np.zeros(len(gd))
    for p in range(sp.n_parts):
        n = int(mk[p].sum())
        acc[ldg[p, :n]] += F[p, :n]
    return acc


@pytest.mark.parametrize("pmethod", ["graph", "rcb"])
def test_window_matches_incident_forces(pmethod):
    prob, dnodes, mat = _problem()
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 4, pmethod
    )
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )
    rng = np.random.default_rng(0)
    gd = (rng.standard_normal(prob.ndof) * 1e-3).astype(np.float32)
    out = {}
    for mode in ("incident", "window"):
        sp = ShardedProblem.build(
            prob, maps, fint_mode="nh", dtype=jnp.float32,
            material=mat, nh_gather=mode, nh_stencil="off",
        )
        out[mode] = _global_forces(sp, gd)
    scale = np.abs(out["incident"]).max()
    assert np.abs(out["window"] - out["incident"]).max() / scale < 1e-5


def test_window_metadata_invariants():
    prob, dnodes, mat = _problem()
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 4, "graph")
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode="nh", dtype=jnp.float32,
        material=mat, nh_gather="window", nh_stencil="off",
    )
    assert sp.nhw_W % 8 == 0
    rel = np.asarray(sp.nhw_idx)
    assert rel.min() >= 0 and rel.max() < sp.nhw_W
    # every real element's window stays in the local node range
    w0 = np.asarray(sp.nhw_w0)
    L = (sp.DL - 1) // 3
    assert (w0 >= 0).all() and (w0 <= L).all()
    # incident structures are not built in window mode
    assert sp.nh_gather is None and sp.nh_G is None


def test_window_solver_trajectory_matches_incident():
    """3-step exchanged run: identical trajectories through the full
    stepper (window build RCM-reorders nodes, so compare globally)."""
    prob, dnodes, mat = _problem()
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 4, "graph")
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )
    res = {}
    for mode in ("incident", "window"):
        sp = ShardedProblem.build(
            prob, maps, fint_mode="nh", dtype=jnp.float32,
            material=mat, nh_gather=mode, nh_stencil="off",
        )
        solver = ShardedSolver(sp, mesh=None)
        d0 = sp.localize(np.zeros(prob.ndof, np.float32))
        dn = sp.localize(np.zeros(prob.ndof, np.float32))
        (_, _), (d0f, _, _) = solver.run(
            d0, dn, 0.0, 3, sync=True, record="none"
        )
        res[mode] = sp.globalize(np.asarray(d0f), prob.ndof)
    scale = max(np.abs(res["incident"]).max(), 1e-30)
    assert np.abs(res["window"] - res["incident"]).max() / scale < 1e-5


def test_box_partition_still_prefers_stencil():
    """nh_gather='auto' must not demote the structured stencil path."""
    prob, dnodes, mat = _problem()
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 4, "box")
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dnodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode="nh", dtype=jnp.float32,
        material=mat, nh_gather="auto",
    )
    assert sp.nhs_dims is not None and sp.nhw_idx is None
