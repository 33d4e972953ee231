"""Partitioning, halo maps, and sharded-vs-serial equivalence.

The reference's exchanged path is mathematically identical to the serial
path (Dynamic_solver.py:22-32 recomputes d1 from the assembled global
F_int; size==1 skips the sync entirely) — so the serial scan stepper is the
oracle for the sharded solver, in both the vmap-emulated and the real
8-virtual-device shard_map backends.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from savtpu.config import Config
from savtpu.mesh import beam_mesh, dirichlet_nodes
from savtpu.ops.assembly import FIntOperator
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    make_device_mesh,
    partition_elements,
)
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import make_step_fn, setup_problem
from savtpu.solvers.explicit import run_explicit_jit


def _problem(nx=8):
    cfg = Config()
    cfg.beam_cells = (nx, 1, 1)
    cfg.beam_extent = (float(nx), 1.0, 1.0)
    return cfg, setup_problem(cfg)


# ---------------- partitioning ----------------

@pytest.mark.parametrize("method", ["rcb", "slab", "graph"])
@pytest.mark.parametrize("n_parts", [2, 3, 4])
def test_partition_coverage_and_balance(method, n_parts):
    cfg, prob = _problem(8)
    cells, points = prob.mesh.tetra, prob.mesh.points
    epart = partition_elements(cells, points, n_parts, method=method)
    assert epart.shape == (len(cells),)
    counts = np.bincount(epart, minlength=n_parts)
    assert counts.sum() == len(cells)
    assert counts.min() > 0
    # balance within 30% of ideal
    assert counts.max() <= 1.3 * len(cells) / n_parts + 1


def test_partition_maps_shared_nodes():
    cfg, prob = _problem(8)
    cells = prob.mesh.tetra
    epart = partition_elements(cells, prob.mesh.points, 2, method="rcb")
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(cells, epart, prob.mesh.num_points, dn_nodes)
    # every element's nodes are in its part's local list
    for p in range(2):
        lset = set(maps.local_nodes[p].tolist())
        for e in maps.local_elements[p]:
            assert set(cells[e].tolist()) <= lset
    # shared = intersection of the two parts' node sets
    inter = set(maps.local_nodes[0].tolist()) & set(
        maps.local_nodes[1].tolist()
    )
    assert set(maps.global_shared.tolist()) == inter
    for p in range(2):
        assert set(maps.shared_nodes[p].tolist()) == inter
    # first-touch order: first element's nodes lead the list
    e0 = maps.local_elements[0][0]
    assert maps.local_nodes[0][:4].tolist() == list(
        dict.fromkeys(cells[e0].tolist())
    )


# ---------------- sharded vs serial ----------------

def _serial_traj(prob, num_steps):
    op = FIntOperator(prob.Ke, prob.edofs, prob.ndof, mode="dense")
    step = make_step_fn(
        op, prob.F_pre, prob.lumped_M, prob.mask, prob.alpha, prob.dt
    )
    traj, _ = run_explicit_jit(step, prob.d0, prob.dn, 0.0, prob.dt, num_steps)
    return np.asarray(traj)


@pytest.mark.parametrize("n_parts", [2, 4])
@pytest.mark.parametrize("fint_mode", ["dense", "ebe", "ell", "banded"])
def test_emulated_exchanged_matches_serial(n_parts, fint_mode):
    cfg, prob = _problem(8)
    num_steps = 100
    ref = _serial_traj(prob, num_steps)

    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode=fint_mode)
    solver = ShardedSolver(sp, mesh=None)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj, shared), carry = solver.run(d0, dnl, 0.0, num_steps, sync=True)
    # compare every saved step, globalized
    for t in range(0, num_steps, 25):
        g = sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
        err = np.linalg.norm(g - ref[t]) / max(np.linalg.norm(ref[t]), 1e-30)
        assert err < 1e-12, (t, err)
    # duplicated shared DOFs agree across parts (exchanged path invariant)
    if sp.maps.max_shared:
        last = np.asarray(traj)[:, -1, :]
        vals = {}
        for p in range(n_parts):
            real = np.flatnonzero(np.asarray(sp.smask[p]))
            for slot in real:
                gd = int(sp.sgi[p][slot])
                v = last[p, int(sp.sld[p][slot])]
                if gd in vals:
                    assert abs(vals[gd] - v) < 1e-13
                vals[gd] = v


def test_shard_map_matches_emulation():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg, prob = _problem(8)
    num_steps = 60
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 4, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense")
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)

    (traj_e, _), _ = ShardedSolver(sp, mesh=None).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    mesh = make_device_mesh(4)
    (traj_m, _), _ = ShardedSolver(sp, mesh=mesh).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    assert np.allclose(np.asarray(traj_e), np.asarray(traj_m), atol=1e-12)


def test_sync_avoiding_mode_runs_and_differs():
    """MODEL=True path: no collective, shared DOFs forced from given rows —
    the d1 formula from unsynced F_int (Dynamic_solver.py:17-20)."""
    cfg, prob = _problem(8)
    num_steps = 40
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense")
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    solver = ShardedSolver(sp, mesh=None)

    # exchanged run provides the "true" shared rows
    (_, shared_true), _ = solver.run(d0, dnl, 0.0, num_steps, sync=True)

    # feeding the true rows into the model path must reproduce the
    # exchanged trajectory exactly (the NN replaces the collective;
    # perfect predictions -> identical dynamics)
    (traj_m, shared_m), _ = solver.run(
        d0, dnl, 0.0, num_steps, sync=False, preds=shared_true
    )
    (traj_s, _), _ = solver.run(d0, dnl, 0.0, num_steps, sync=True)
    assert np.allclose(
        np.asarray(traj_m), np.asarray(traj_s), atol=1e-12
    )


def test_shard_map_multiple_parts_per_device():
    """8 parts over 4 devices: shard_map splits the part axis 2-per-device;
    local sums compose with the cross-device psum (how big meshes keep
    local dense blocks small on real hardware)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg, prob = _problem(16)
    num_steps = 50
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 8, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense")
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj_e, _), _ = ShardedSolver(sp, mesh=None).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    mesh = make_device_mesh(4)
    (traj_m, _), _ = ShardedSolver(sp, mesh=mesh).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    assert np.allclose(np.asarray(traj_e), np.asarray(traj_m), atol=1e-12)


def test_rcm_reorder_maps_consistency():
    from savtpu.parallel.halo import rcm_reorder_maps

    cfg, prob = _problem(10)
    cells = prob.mesh.tetra
    epart = partition_elements(cells, prob.mesh.points, 3, method="rcb")
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(cells, epart, prob.mesh.num_points, dn_nodes)
    rc = rcm_reorder_maps(maps, cells)
    for p in range(3):
        # same node sets, permuted order
        assert set(rc.local_nodes[p].tolist()) == set(
            maps.local_nodes[p].tolist()
        )
        assert set(rc.shared_nodes[p].tolist()) == set(
            maps.shared_nodes[p].tolist()
        )
        # dirichlet refers to the same global nodes
        old_d = {int(maps.local_nodes[p][d // 3]) for d in maps.local_dirichlet[p]}
        new_d = {int(rc.local_nodes[p][d // 3]) for d in rc.local_dirichlet[p]}
        assert old_d == new_d
        # RCM reduces (or preserves) the element dof bandwidth
        def bandwidth(m):
            lk = {int(g): i for i, g in enumerate(m.local_nodes[p])}
            w = 0
            for e in m.local_elements[p]:
                loc = [lk[int(n)] for n in cells[e]]
                w = max(w, max(loc) - min(loc))
            return w
        assert bandwidth(rc) <= bandwidth(maps)


def test_save_every_in_scan_matches_post_stride():
    """In-scan save_every blocking (VERDICT item 2): strided trajectory and
    full-res shared trace must equal the save_every=1 run post-strided, in
    both the vmap-emulated and shard_map backends, with and without preds."""
    cfg, prob = _problem(8)
    num_steps, se = 60, 5
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense")
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    solver = ShardedSolver(sp, mesh=None)

    (traj1, shared1), carry1 = solver.run(d0, dnl, 0.0, num_steps, sync=True)
    (trajS, sharedS), carryS = solver.run(
        d0, dnl, 0.0, num_steps, sync=True, save_every=se
    )
    assert trajS.shape[1] == num_steps // se
    assert np.allclose(np.asarray(traj1)[:, ::se], np.asarray(trajS),
                       atol=1e-14)
    assert np.allclose(np.asarray(shared1), np.asarray(sharedS), atol=1e-14)
    for a, b in zip(carry1, carryS):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-14)

    # model path with preds fed in
    preds = shared1
    (trajM1, _), cM1 = solver.run(
        d0, dnl, 0.0, num_steps, sync=False, preds=preds
    )
    (trajMS, _), cMS = solver.run(
        d0, dnl, 0.0, num_steps, sync=False, preds=preds, save_every=se
    )
    assert np.allclose(np.asarray(trajM1)[:, ::se], np.asarray(trajMS),
                       atol=1e-14)

    # shard_map backend
    if len(jax.devices()) >= 2:
        mesh = make_device_mesh(2)
        (trajD, sharedD), _ = ShardedSolver(sp, mesh=mesh).run(
            d0, dnl, 0.0, num_steps, sync=True, save_every=se
        )
        assert np.allclose(np.asarray(trajD), np.asarray(trajS), atol=1e-12)
        assert np.allclose(np.asarray(sharedD), np.asarray(sharedS),
                           atol=1e-12)


def test_run_streamed_matches_run():
    """Chunked host offload: run_streamed must reproduce run exactly,
    including across chunk boundaries and with save_every blocking."""
    cfg, prob = _problem(8)
    num_steps, se = 60, 3
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense")
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    solver = ShardedSolver(sp, mesh=None)

    (traj, shared), carry = solver.run(
        d0, dnl, 0.0, num_steps, sync=True, save_every=se
    )
    # chunk_steps=21 exercises rounding to a save_every multiple and a
    # shorter final chunk
    (trajS, sharedS), carryS = solver.run_streamed(
        d0, dnl, 0.0, num_steps, sync=True, save_every=se, chunk_steps=21
    )
    assert isinstance(trajS, np.ndarray) and isinstance(sharedS, np.ndarray)
    assert np.allclose(np.asarray(traj), trajS, atol=1e-14)
    assert np.allclose(np.asarray(shared), sharedS, atol=1e-14)
    for a, b in zip(carry, carryS):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-14)

    # preds split across chunks
    (trajM, _), _ = solver.run(
        d0, dnl, 0.0, num_steps, sync=False, preds=shared
    )
    (trajMS, _), _ = solver.run_streamed(
        d0, dnl, 0.0, num_steps, sync=False, preds=shared, chunk_steps=24
    )
    assert np.allclose(np.asarray(trajM), trajMS, atol=1e-14)

    # adaptive sizing (chunk_steps=None): probe-divisor/uniform dispatch
    # plan — the compile-discipline path the pipeline stages run
    (trajA, sharedA), carryA = solver.run_streamed(
        d0, dnl, 0.0, num_steps, sync=True, save_every=se
    )
    assert np.allclose(np.asarray(traj), trajA, atol=1e-14)
    assert np.allclose(np.asarray(shared), sharedA, atol=1e-14)
    for a, b in zip(carry, carryA):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-14)


@pytest.mark.parametrize("n_parts", [2, 4, 8])
def test_permute_exchange_matches_psum(n_parts):
    """Neighbor-packed halo (VERDICT item 5): R rounds of point-to-point
    permutes of packed interface DOFs must reproduce the global-shared
    psum exchange at 1e-12 — emulated backend, all part counts (includes
    3-way-shared corner nodes at n_parts >= 4 on a 3D-partitioned mesh)."""
    cfg, prob = _problem(8)
    num_steps = 80
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    spp = ShardedProblem.build(prob, maps, fint_mode="dense",
                               exchange_mode="permute")
    sps = ShardedProblem.build(prob, maps, fint_mode="dense",
                               exchange_mode="psum")
    d0 = sps.localize(prob.d0)
    dnl = sps.localize(prob.dn)
    (tp, shp), cp = ShardedSolver(spp, mesh=None).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    (ts, shs), cs = ShardedSolver(sps, mesh=None).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    ref = np.abs(np.asarray(ts)).max() or 1.0
    assert np.abs(np.asarray(tp) - np.asarray(ts)).max() / ref < 1e-12
    assert np.abs(np.asarray(shp) - np.asarray(shs)).max() / ref < 1e-12

    # duplicated shared DOFs agree across owners (the exchange invariant)
    last = np.asarray(tp)[:, -1, :]
    vals = {}
    for p in range(n_parts):
        for slot in np.flatnonzero(np.asarray(spp.smask[p])):
            gd = int(spp.sgi[p][slot])
            v = last[p, int(spp.sld[p][slot])]
            if gd in vals:
                assert abs(vals[gd] - v) <= 1e-12 * ref
            vals[gd] = v


def test_permute_exchange_shard_map_matches_emulation():
    """ppermute over an 8-virtual-device mesh == emulated permute."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg, prob = _problem(16)
    num_steps = 50
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 8, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense",
                              exchange_mode="permute")
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (te, _), _ = ShardedSolver(sp, mesh=None).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    mesh = make_device_mesh(8)
    (tm, _), _ = ShardedSolver(sp, mesh=mesh).run(
        d0, dnl, 0.0, num_steps, sync=True
    )
    assert np.allclose(np.asarray(te), np.asarray(tm), atol=1e-12)

    # permute with multiple parts per device must be rejected
    with pytest.raises(ValueError, match="one part per device"):
        ShardedSolver(sp, mesh=make_device_mesh(4))


def test_unknown_exchange_mode_rejected():
    cfg, prob = _problem(8)
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 2, "rcb")
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    with pytest.raises(ValueError, match="unknown exchange_mode"):
        ShardedProblem.build(prob, maps, exchange_mode="ring")


def test_auto_fint_mode_threshold_and_equivalence():
    """'auto' picks dense below the DL cutoff and banded above it
    (VERDICT round-1 weak #8), and the auto-picked problem reproduces the
    serial oracle like the explicitly-chosen modes."""
    cfg, prob = _problem(8)
    epart = partition_elements(prob.mesh.tetra, prob.mesh.points, 2, "rcb")
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="auto")
    assert 3 * maps.max_local_nodes + 1 <= 1536
    assert sp.fint_mode == "dense" and sp.denseK is not None

    num_steps = 50
    ref = _serial_traj(prob, num_steps)
    solver = ShardedSolver(sp, mesh=None)
    (traj, _), _ = solver.run(
        sp.localize(prob.d0), sp.localize(prob.dn), 0.0, num_steps,
        sync=True,
    )
    g = sp.globalize(np.asarray(traj)[:, -1, :], prob.ndof)
    err = np.linalg.norm(g - ref[-1]) / max(np.linalg.norm(ref[-1]), 1e-30)
    assert err < 1e-12

    # above the cutoff: banded with RCM-reordered maps
    class FakeMaps:
        pass

    big = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    # force the estimate over the threshold by checking the branch logic
    # on a genuinely big mesh instead of monkeypatching:
    cfg2 = Config()
    cfg2.beam_cells = (40, 4, 4)
    cfg2.beam_extent = (10.0, 1.0, 1.0)
    from savtpu.solvers import setup_problem as _setup

    prob2 = _setup(cfg2)
    epart2 = partition_elements(
        prob2.mesh.tetra, prob2.mesh.points, 2, "rcb"
    )
    dn2 = dirichlet_nodes(prob2.mesh.triangles, prob2.mesh.points)
    maps2 = build_partition_maps(
        prob2.mesh.tetra, epart2, prob2.mesh.num_points, dn2
    )
    assert 3 * maps2.max_local_nodes + 1 > 1536
    sp2 = ShardedProblem.build(prob2, maps2, fint_mode="auto")
    assert sp2.fint_mode == "banded" and sp2.band_Kd is not None

    # banded-auto matches dense on a short run
    spd = ShardedProblem.build(prob2, maps2, fint_mode="dense")
    d0 = spd.localize(prob2.d0)
    dnl = spd.localize(prob2.dn)
    (t2, _), _ = ShardedSolver(sp2, mesh=None).run(
        spd.localize(prob2.d0), spd.localize(prob2.dn), 0.0, 30, sync=True
    )
    (td, _), _ = ShardedSolver(spd, mesh=None).run(d0, dnl, 0.0, 30,
                                                   sync=True)
    # banded maps are RCM-reordered: compare globalized
    ga = sp2.globalize(np.asarray(t2)[:, -1, :], prob2.ndof)
    gd = spd.globalize(np.asarray(td)[:, -1, :], prob2.ndof)
    assert np.linalg.norm(ga - gd) / np.linalg.norm(gd) < 1e-12
