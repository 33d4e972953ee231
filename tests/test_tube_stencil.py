"""Curvilinear (periodic tube) stencil fast paths.

The structured-box stencil force kernels, the face-plane online access
and the grid face-plane exchange generalize from the congruent beam
grid to LOGICALLY structured curvilinear grids: the annular tube
(savtpu.mesh.generator.tube_mesh — the coronary-vessel stand-in, the
reference's target geometry class, /root/reference/README.md:44,
Tools/Mat_construction.py:79 ``Local_K_coronary``). Per-type baked
constants become per-cell broadcast arrays (stencil.cell_type_geometry),
theta is periodic (a seam part owns the wrapped global column j=0 as
its high local column; a full-ring part gets a wrapped corner column in
the kernel), and everything must agree with the generic gather paths to
rounding.
"""

import dataclasses

import numpy as np
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.mesh.generator import tube_mesh
from savtpu.ops.material import NeoHookean
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
    stencil,
)
from savtpu.parallel.sharded import ShardedSolver
from savtpu.solvers import setup_problem


def _tube(n_r=2, n_theta=8, n_z=6):
    return tube_mesh(n_r=n_r, n_theta=n_theta, n_z=n_z)


def _setup(mesh, n_parts, method="box"):
    cfg = Config()
    prob = setup_problem(cfg, mesh=mesh)
    epart = partition_elements(
        mesh.tetra, mesh.points, n_parts, method=method
    )
    dn = dirichlet_nodes(mesh.triangles, mesh.points)
    maps = build_partition_maps(
        mesh.tetra, epart, mesh.num_points, dn
    )
    return prob, maps


def test_detect_curvilinear():
    mesh = _tube()
    assert stencil.detect_curvilinear(mesh) == (2, 8, 6)
    # beam-grid detector must NOT claim the tube
    assert stencil.detect_structured(mesh) is None
    # perturbed geometry is rejected (falls back to generic paths)
    mesh.points[7] += 0.01
    assert stencil.detect_curvilinear(mesh) is None


def test_box_partition_on_tube():
    mesh = _tube()
    # 4 parts: theta x z split -> the seam part owns wrapped column 0
    prob, maps = _setup(mesh, 4)
    box = stencil.detect_box_partition(mesh, maps)
    assert box is not None and box.wrap_y and not box.full_ring
    assert box.spacing is None  # curvilinear: per-cell geometry
    # 3 parts: z slabs -> every part spans the whole ring
    prob, maps = _setup(mesh, 3)
    box = stencil.detect_box_partition(mesh, maps)
    assert box is not None and box.full_ring
    assert box.node_dims == (3, 8, 3)  # ring: 8 theta node columns


def test_cell_geometry_matches_congruent_constants():
    """On a congruent beam grid the per-cell arrays must collapse to the
    48 baked type_geometry constants (all three axes invariant)."""
    cfg = Config()
    cfg.beam_cells = (4, 2, 2)
    cfg.beam_extent = (4.0, 2.0, 2.0)
    prob = setup_problem(cfg)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="box"
    )
    dn = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn
    )
    box = stencil.detect_box_partition(prob.mesh, maps)
    box = dataclasses.replace(box, spacing=None)  # force cell path
    Gc, dJwc = stencil.cell_type_geometry(prob.mesh, box)
    assert Gc.shape == (2, 6, 1, 1, 1, 4, 3)  # all axes collapsed
    G6, dJw6 = stencil.type_geometry((1.0, 1.0, 1.0))
    np.testing.assert_allclose(Gc[0, :, 0, 0, 0], G6, atol=1e-12)
    np.testing.assert_allclose(dJwc[0, :, 0, 0, 0], dJw6, atol=1e-12)


def _force_parity(mesh, n_parts, material=None):
    prob, maps = _setup(mesh, n_parts)
    kw = {}
    if material is not None:
        sp_f = ShardedProblem.build(prob, maps, material=material)
        sp_g = ShardedProblem.build(
            prob, maps, material=material, nh_stencil="off"
        )
    else:
        sp_f = ShardedProblem.build(prob, maps, fint_mode="stencil")
        sp_g = ShardedProblem.build(prob, maps, fint_mode="dense")
    assert sp_f.nhs_dims is not None, "stencil did not activate on tube"
    assert sp_f.nhs_Gc is not None, "expected per-cell geometry arrays"
    rng = np.random.default_rng(0)
    dg = rng.normal(size=(prob.ndof,)) * 1e-3
    ff = sp_f.globalize(
        np.asarray(sp_f._fint_stacked(sp_f.localize(dg))), prob.ndof
    )
    fg = sp_g.globalize(
        np.asarray(sp_g._fint_stacked(sp_g.localize(dg))), prob.ndof
    )
    assert np.abs(ff - fg).max() / np.abs(fg).max() < 1e-13
    return prob, maps, sp_f, sp_g


@pytest.mark.parametrize("n_parts", [4, 3])  # seam-wrap part / full ring
def test_tube_linear_stencil_force(n_parts):
    _force_parity(_tube(), n_parts)


@pytest.mark.parametrize("n_parts", [4, 3])
def test_tube_nh_stencil_force(n_parts):
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    _force_parity(_tube(), n_parts, material=mat)


@pytest.mark.parametrize("n_parts", [4, 3])
def test_tube_stencil_exchanged_trajectory(n_parts):
    """Exchanged (synced) trajectories: stencil fint + psum vs the
    dense fallback — the layouts differ (box-lex vs first-touch), the
    physics must not."""
    prob, maps, sp_f, sp_g = _force_parity(_tube(), n_parts)
    steps = 80
    out = {}
    for key, sp in (("f", sp_f), ("g", sp_g)):
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, steps, sync=True)
        out[key] = np.stack(
            [
                sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
                for t in range(0, steps, 20)
            ]
        )
    scale = max(np.abs(out["g"]).max(), 1e-30)
    assert np.abs(out["f"] - out["g"]).max() / scale < 1e-9


def test_tube_grid_exchange_seam():
    """exchange_mode='grid' on a theta-split tube: the periodic seam
    pair must complete the owner sum (compare against psum on the same
    build, single exchange, exact)."""
    mesh = _tube(n_r=2, n_theta=8, n_z=4)
    prob, maps = _setup(mesh, 8)  # factorization splits theta
    sp = ShardedProblem.build(
        prob, maps, fint_mode="stencil", exchange_mode="grid"
    )
    assert sp.grid_wrap, "theta part ring should enable the seam pair"
    rng = np.random.default_rng(1)
    fg = rng.normal(size=(prob.ndof,))
    ep = np.asarray(sp._exchange(sp.localize(fg), lambda x: x))
    eg = np.asarray(sp._exchange_grid(sp.localize(fg)))
    np.testing.assert_allclose(ep, eg, rtol=0, atol=1e-12)


def test_tube_grid_exchange_trajectory():
    mesh = _tube(n_r=2, n_theta=8, n_z=4)
    prob, maps = _setup(mesh, 8)
    out = {}
    for ex in ("psum", "grid"):
        sp = ShardedProblem.build(
            prob, maps, fint_mode="stencil", exchange_mode=ex
        )
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        (traj, _), _ = ShardedSolver(sp).run(d0, dn, 0.0, 60, sync=True)
        out[ex] = np.stack(
            [
                sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
                for t in range(0, 60, 20)
            ]
        )
    scale = max(np.abs(out["psum"]).max(), 1e-30)
    assert np.abs(out["psum"] - out["grid"]).max() / scale < 1e-9


def test_tube_comm_free_identity():
    """Perfect-prediction overwrite == synced run on the tube stencil
    path (the sync-avoiding mode of the production runs)."""
    mesh = _tube()
    prob, maps = _setup(mesh, 4)
    sp = ShardedProblem.build(prob, maps, fint_mode="stencil")
    d0 = sp.localize(prob.d0)
    dn = sp.localize(prob.dn)
    steps = 60
    (ts, shared_true), _ = ShardedSolver(sp).run(
        d0, dn, 0.0, steps, sync=True
    )
    (tm, _), _ = ShardedSolver(sp).run(
        d0, dn, 0.0, steps, sync=False, preds=shared_true
    )
    np.testing.assert_allclose(
        np.asarray(tm), np.asarray(ts), atol=1e-12
    )


def test_tube_online_faces_match_generic():
    """Face-plane online access (prediction overwrite + record) on the
    tube: nulling stn_face_cidx isolates the face machinery, results
    must agree to 1e-15 (same pattern as test_stencil_faces)."""
    mesh = _tube()
    prob, maps = _setup(mesh, 4)
    sp = ShardedProblem.build(prob, maps, fint_mode="stencil")
    assert sp.stn_face_cidx is not None
    generic = dataclasses.replace(sp, stn_face_cidx=None)
    rng = np.random.default_rng(0)
    d = 1e-3 * rng.standard_normal(prob.ndof)
    d0 = sp.localize(d)
    dn = sp.localize(d * 0.98)
    T, se = 12, 4
    P, S3 = sp.sld.shape
    preds = 1e-3 * rng.standard_normal((P, T, S3)) * np.asarray(
        sp.smask
    )[:, None, :]
    (tr_f, sh_f), c_f = sp.stacked_run(
        d0, dn, 0.0, T, sync=False, preds=preds, record="all",
        save_every=se,
    )
    (tr_g, sh_g), c_g = generic.stacked_run(
        d0, dn, 0.0, T, sync=False, preds=preds, record="all",
        save_every=se,
    )
    np.testing.assert_allclose(tr_f, tr_g, rtol=0, atol=1e-15)
    np.testing.assert_allclose(sh_f, sh_g, rtol=0, atol=1e-15)
    for a, b in zip(c_f, c_g):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-15)


def test_tube_stencil_under_device_mesh():
    """The tube stencil path (per-cell geometry arrays nhs_Gc/nhs_dJwc,
    exchanged + comm-free with face-plane online access) executing
    INSIDE shard_map over an 8-virtual-device mesh matches the
    single-device emulation to 1e-12. Regression: nhs_Gc originally
    rode as a closure constant with a full P leading axis instead of a
    sharded _data() argument — correct under vmap emulation, shape
    error under a real mesh."""
    import jax.numpy as jnp

    from savtpu.parallel import make_device_mesh

    mesh = _tube(n_r=2, n_theta=8, n_z=8)
    prob, maps = _setup(mesh, 8)
    sp = ShardedProblem.build(
        prob, maps, fint_mode="stencil", dtype=jnp.float64,
        compensated=True,
    )
    assert sp.nhs_Gc is not None
    steps, se = 40, 5
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    out = {}
    for key, dm in (("emul", None), ("mesh", make_device_mesh(8))):
        (traj, sh), carry = ShardedSolver(sp, mesh=dm).run(
            d0, dnl, 0.0, steps, sync=True, record="all", save_every=se
        )
        # comm-free leg with the recorded shared rows as predictions
        (traj2, _), _ = ShardedSolver(sp, mesh=dm).run(
            d0, dnl, 0.0, steps, sync=False, preds=sh,
            record="traj", save_every=se,
        )
        out[key] = (np.asarray(traj), np.asarray(sh), np.asarray(traj2))
    for a, b in zip(out["mesh"], out["emul"]):
        nb = np.linalg.norm(b)
        assert np.linalg.norm(a - b) <= 1e-12 * max(nb, 1e-30)


def test_tube_msh_roundtrip_keeps_fast_path():
    """The .msh ingestion path (how a real coronary mesh arrives) must
    preserve stencil eligibility: write the tube, read it back, the
    curvilinear detector still fires and forces still match."""
    import tempfile
    from pathlib import Path

    from savtpu.mesh.msh_io import read_msh, write_msh

    mesh = _tube()
    with tempfile.TemporaryDirectory() as td:
        path = Path(td) / "tube.msh"
        write_msh(path, mesh)
        m2 = read_msh(path)
    assert stencil.detect_curvilinear(m2) == (2, 8, 6)
    _force_parity(m2, 4)
