"""Face-plane shared-DOF access in stencil mode.

In lex box layout the shared nodes are exactly the part-box face
planes, so stacked_run's online overhead (per-step prediction
overwrite + shared-trace record) runs through static face slices with
compact<->face conversion once per save_every block. The compact
artifact contract (sld order) is unchanged at the stacked_run
boundary, so the face path must match the generic gather/scatter path
bit-for-bit-ish (1e-15, f64): same problem, same inputs, only the
layout of the in-scan shared-DOF access differs.

The generic path is obtained from the SAME ShardedProblem by nulling
stn_face_cidx (the use_faces gate), so the comparison isolates exactly
the face machinery.
"""

import dataclasses

import numpy as np
import pytest

from savtpu.config import Config
from savtpu.mesh import dirichlet_nodes
from savtpu.parallel import (
    ShardedProblem,
    build_partition_maps,
    partition_elements,
)
from savtpu.solvers import setup_problem


def _problem(cells=(8, 4, 2), n_parts=8):
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


def _pair(compensated):
    prob, maps = _problem()
    sp = ShardedProblem.build(
        prob, maps, fint_mode="stencil", compensated=compensated
    )
    assert sp.stn_face_cidx is not None
    generic = dataclasses.replace(sp, stn_face_cidx=None)
    return prob, sp, generic


def _state(sp, prob, seed=0):
    rng = np.random.default_rng(seed)
    d = 1e-3 * rng.standard_normal(prob.ndof)
    d0 = sp.localize(d)
    dn = sp.localize(d * 0.98)
    return d0, dn


def _preds(sp, T, seed=1):
    rng = np.random.default_rng(seed)
    P, S3 = sp.sld.shape
    return 1e-3 * rng.standard_normal((P, T, S3)) * np.asarray(
        sp.smask
    )[:, None, :]


@pytest.mark.parametrize("compensated", [False, True])
def test_online_faces_match_generic(compensated):
    """Comm-free run with per-step prediction overwrite + full record:
    trajectory, shared trace, and carry agree with the generic path."""
    prob, sp, generic = _pair(compensated)
    d0, dn = _state(sp, prob)
    T, se = 12, 4
    preds = _preds(sp, T)
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


def test_blend_faces_match_generic():
    """Blended (resync release) overwrite through faces == generic."""
    prob, sp, generic = _pair(True)
    d0, dn = _state(sp, prob)
    T, se = 8, 4
    preds = _preds(sp, T)
    blend = np.linspace(0.0, 1.0, T)
    (_, sh_f), c_f = sp.stacked_run(
        d0, dn, 0.0, T, sync=False, preds=preds, blend=blend,
        record="shared", save_every=se,
    )
    (_, sh_g), c_g = generic.stacked_run(
        d0, dn, 0.0, T, sync=False, preds=preds, blend=blend,
        record="shared", save_every=se,
    )
    np.testing.assert_allclose(sh_f, sh_g, rtol=0, atol=1e-15)
    np.testing.assert_allclose(c_f[0], c_g[0], rtol=0, atol=1e-15)


def test_sync_record_faces_match_generic():
    """Exchanged (stage-1) run: the face-plane shared-trace record
    matches the generic gather at full temporal resolution."""
    prob, sp, generic = _pair(True)
    d0, dn = _state(sp, prob)
    T, se = 12, 4
    (tr_f, sh_f), _ = sp.stacked_run(
        d0, dn, 0.0, T, sync=True, record="all", save_every=se
    )
    (tr_g, sh_g), _ = generic.stacked_run(
        d0, dn, 0.0, T, sync=True, record="all", save_every=se
    )
    np.testing.assert_allclose(tr_f, tr_g, rtol=0, atol=1e-15)
    np.testing.assert_allclose(sh_f, sh_g, rtol=0, atol=1e-15)


def test_face_maps_cover_all_shared():
    """Every real compact slot is fed by a face slot and every masked
    face slot round-trips its compact value."""
    prob, sp, _ = _pair(True)
    cidx = np.asarray(sp.stn_face_cidx)
    fmask = np.asarray(sp.stn_face_mask)
    conc = np.asarray(sp.stn_conc_idx)
    smask = np.asarray(sp.smask)
    P, S3 = smask.shape
    rng = np.random.default_rng(2)
    rows = rng.standard_normal((P, S3)) * smask
    face = np.take_along_axis(rows, cidx, axis=1) * fmask
    back = np.take_along_axis(face, conc, axis=1) * smask
    np.testing.assert_allclose(back, rows, rtol=0, atol=0)


def test_stencil_faces_under_device_mesh():
    """The stencil face-plane online path (per-step face overwrite +
    face record, compact conversion per block) executing INSIDE
    shard_map over an 8-virtual-device mesh matches the single-device
    emulation to 1e-12."""
    import jax.numpy as jnp

    from savtpu.parallel import make_device_mesh
    from savtpu.parallel.sharded import ShardedSolver

    prob, maps = _problem(cells=(16, 2, 2), n_parts=8)
    sp = ShardedProblem.build(
        prob, maps, fint_mode="stencil", dtype=jnp.float64,
        compensated=True,
    )
    steps, save_every = 60, 5
    preds = _preds(sp, steps)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj_e, sh_e), carry_e = ShardedSolver(sp, mesh=None).run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=save_every,
    )
    (traj_m, sh_m), carry_m = ShardedSolver(
        sp, mesh=make_device_mesh(8)
    ).run(
        d0, dnl, 0.0, steps, sync=False, preds=preds,
        record="all", save_every=save_every,
    )
    for a, b in ((traj_m, traj_e), (sh_m, sh_e)):
        nb = np.linalg.norm(np.asarray(b))
        assert np.linalg.norm(
            np.asarray(a) - np.asarray(b)
        ) <= 1e-12 * max(nb, 1e-30)
    for cm, ce in zip(carry_m[:2], carry_e[:2]):
        nc_ = np.linalg.norm(np.asarray(ce))
        assert np.linalg.norm(
            np.asarray(cm) - np.asarray(ce)
        ) <= 1e-12 * max(nc_, 1e-30)
