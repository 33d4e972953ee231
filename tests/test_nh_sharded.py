"""Neo-Hookean matrix-free stepping under the sharded solver.

The exchanged sharded path must reproduce the serial nonlinear oracle
(NeoHookeanFIntOperator + run_explicit) exactly, like the linear modes do
— the material only changes F_int, not the halo/update contract.
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
from savtpu.solvers import make_step_fn, setup_problem
from savtpu.solvers.explicit import run_explicit_jit
from savtpu.solvers.nonlinear import NeoHookeanFIntOperator


def _problem(nx=6):
    cfg = Config()
    cfg.beam_cells = (nx, 1, 1)
    cfg.beam_extent = (float(nx), 1.0, 1.0)
    return cfg, setup_problem(cfg)


@pytest.mark.parametrize("n_parts", [2, 3])
def test_nh_sharded_matches_serial(n_parts):
    cfg, prob = _problem()
    steps = 120
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    op = NeoHookeanFIntOperator(mat, prob.coords, prob.edofs, prob.ndof)
    step = make_step_fn(
        op, prob.F_pre, prob.lumped_M, prob.mask, prob.alpha, prob.dt
    )
    ref, _ = run_explicit_jit(step, prob.d0, prob.dn, 0.0, prob.dt, steps)
    ref = np.asarray(ref)

    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, n_parts, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, material=mat)
    assert sp.fint_mode == "nh"
    solver = ShardedSolver(sp)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    (traj, _), _ = solver.run(d0, dnl, 0.0, steps, sync=True)
    # the sharded path evaluates the nonlinear force in SoA form
    # (_nh_fint) — a different but algebraically identical arithmetic
    # organization from the serial per-element oracle, so agreement is
    # rounding-level relative to the trajectory amplitude, not bitwise
    scale = max(np.abs(ref).max(), 1e-30)
    for t in range(0, steps, 30):
        g = sp.globalize(np.asarray(traj)[:, t, :], prob.ndof)
        err = np.abs(g - ref[t]).max() / scale
        assert err < 1e-9, (t, err)


def test_nh_comm_free_and_compensated_run():
    """Comm-free overwrite mode + compensated carry both work with the
    nonlinear F_int (translation removal is exact for NH too: the
    deformation gradient is translation-invariant)."""
    cfg, prob = _problem()
    steps = 60
    mat = NeoHookean.from_engineering(E=1e6, nu=0.3, rho=1.0, fz=0.5)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, 2, method="rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp_p = ShardedProblem.build(prob, maps, material=mat)
    sp_c = ShardedProblem.build(prob, maps, material=mat, compensated=True)
    d0 = sp_p.localize(prob.d0)
    dnl = sp_p.localize(prob.dn)
    # perfect-prediction identity with the nonlinear stepper
    (_, shared_true), _ = ShardedSolver(sp_p).run(
        d0, dnl, 0.0, steps, sync=True
    )
    (tm, _), _ = ShardedSolver(sp_p).run(
        d0, dnl, 0.0, steps, sync=False, preds=shared_true
    )
    (ts, _), _ = ShardedSolver(sp_p).run(d0, dnl, 0.0, steps, sync=True)
    assert np.allclose(np.asarray(tm), np.asarray(ts), atol=1e-12)
    # compensated vs plain at f64
    (tc, _), _ = ShardedSolver(sp_c).run(d0, dnl, 0.0, steps, sync=True)
    scale = max(np.abs(np.asarray(ts)).max(), 1e-30)
    assert np.abs(np.asarray(tc) - np.asarray(ts)).max() / scale < 1e-11


def test_nh_pipeline_end_to_end(tmp_path):
    """Full 5-stage sync-avoiding pipeline on the neo-Hookean material
    (the runs/nh_demo configuration at smoke scale): warm-up equality,
    finite bounded prediction, artifacts present. Pins the path that
    produced the 0.92% demo (docs/STATUS_r3.md)."""
    import numpy as np

    from savtpu.io.artifacts import ArtifactStore, load_displacement
    from savtpu.pipeline import run_all
    from test_pipeline import _smoke_cfg

    cfg = _smoke_cfg(tmp_path)
    cfg.material.model = "neo_hookean"
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
        assert np.abs(pred).max() < 10 * max(np.abs(data).max(), 1e-12)
