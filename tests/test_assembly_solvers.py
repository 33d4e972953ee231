"""Assembly + steady/ghost/explicit solver tests against the NumPy oracle,
plus reference-mesh parity (VTK parsing, CFL dt, steady solve)."""

import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from savtpu.config import Config
from savtpu.mesh import beam_mesh, read_vtk, cfl_dt, dirichlet_nodes
from savtpu.mesh.geometry import node_to_dof
from savtpu.ops.assembly import (
    FIntOperator,
    assemble_dense,
    assemble_force,
    assemble_lumped_mass,
    element_dofs,
)
from savtpu.ops.element import batch_element_mkf, gather_coords
from savtpu.ops.material import LinearElastic
from savtpu.solvers import setup_problem, steady_solve, run_explicit, make_step_fn
from savtpu.solvers.explicit import run_explicit_jit

MAT = dict(E=1e6, nu=0.3, rho=1.0, fz=0.5)


def _small_problem():
    mesh = beam_mesh(4, 1, 1, extent=(4.0, 1.0, 1.0))
    mat = LinearElastic.from_engineering(**MAT, ramped=False)
    coords = gather_coords(mesh.tetra, mesh.points)
    edofs = element_dofs(mesh.tetra)
    Me, Ke, Fe = batch_element_mkf(1, 2, mat, 0.0, coords)
    dnodes = dirichlet_nodes(mesh.triangles, mesh.points)
    ddofs = node_to_dof(dnodes)
    return mesh, mat, edofs, Me, Ke, Fe, ddofs


def test_assembly_matches_oracle():
    mesh, mat, edofs, Me, Ke, Fe, ddofs = _small_problem()
    ndof = mesh.num_dofs
    Mo, Ko, Fo = oracle.global_assembly_nobc(
        mesh.tetra, mesh.points, mat.lmd, mat.mu, mat.rho,
        np.array([0, -mat.fz, -mat.fz]),
    )
    K = np.asarray(assemble_dense(Ke, edofs, ndof))
    F = np.asarray(assemble_force(Fe, edofs, ndof))
    lM = np.asarray(assemble_lumped_mass(Me, edofs, ndof))
    assert np.allclose(K, Ko, rtol=1e-12, atol=1e-8)
    assert np.allclose(F, Fo, rtol=1e-12, atol=1e-14)
    assert np.allclose(lM, Mo.sum(axis=1), rtol=1e-12, atol=1e-14)
    # total lumped mass = 3 * rho * volume
    assert abs(lM.sum() - 3 * mat.rho * 4.0) < 1e-9


@pytest.mark.parametrize("mode", ["dense", "ebe", "bcoo"])
def test_fint_operator_modes_agree(mode):
    mesh, mat, edofs, Me, Ke, Fe, ddofs = _small_problem()
    ndof = mesh.num_dofs
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=ndof))
    ref = np.asarray(assemble_dense(Ke, edofs, ndof)) @ np.asarray(d)
    op = FIntOperator(Ke, edofs, ndof, mode=mode)
    out = np.asarray(op(d))
    assert np.allclose(out, ref, rtol=1e-10, atol=1e-8)


def test_steady_matches_oracle():
    mesh, mat, edofs, Me, Ke, Fe, ddofs = _small_problem()
    d = np.asarray(steady_solve(Ke, Fe, edofs, mesh.num_dofs, ddofs))
    do = oracle.steady_solve(
        mesh.tetra, mesh.points, mat.lmd, mat.mu, mat.rho,
        np.array([0, -mat.fz, -mat.fz]), ddofs,
    )
    assert np.linalg.norm(d - do) / np.linalg.norm(do) < 1e-10
    # cantilever sanity: loaded in -y/-z, so tip moves down in y and z
    tip_node = int(np.argmax(mesh.points[:, 0]))
    assert d[3 * tip_node + 1] < 0 and d[3 * tip_node + 2] < 0


def test_steady_sparse_host_matches_dense():
    """The >6k-DOF host sparse-direct path must agree with the dense jnp
    solve (same Dirichlet unit-diagonal treatment)."""
    from savtpu.solvers.steady import _steady_solve_sparse_host

    mesh, mat, edofs, Me, Ke, Fe, ddofs = _small_problem()
    dd = np.asarray(steady_solve(Ke, Fe, edofs, mesh.num_dofs, ddofs))
    ds = np.asarray(
        _steady_solve_sparse_host(Ke, Fe, edofs, mesh.num_dofs, ddofs)
    )
    assert np.linalg.norm(dd - ds) / np.linalg.norm(dd) < 1e-10


def test_steady_device_pcg_matches_dense():
    """The large-mesh two-level PCG path (device CG + coarse-grid
    preconditioner + f64 defect correction) must agree with the dense
    solve. Exercised at small size by dropping the coarse-space gate and
    target so every branch (trilinear P, Galerkin K_c, Cholesky W,
    chunked CG, defect rounds) runs in-suite."""
    from savtpu.solvers.steady import _steady_solve_pcg

    mesh = beam_mesh(16, 3, 3, extent=(16.0 / 3.0, 1.0, 1.0))
    mat = LinearElastic.from_engineering(**MAT, ramped=False)
    coords = gather_coords(mesh.tetra, mesh.points)
    edofs = element_dofs(mesh.tetra)
    _, Ke, Fe = batch_element_mkf(1, 2, mat, 0.0, coords)
    ddofs = node_to_dof(dirichlet_nodes(mesh.triangles, mesh.points))
    ndof = mesh.num_dofs
    dd = np.asarray(steady_solve(Ke, Fe, edofs, ndof, ddofs))
    x, rel = _steady_solve_pcg(
        Ke, Fe, edofs, ndof, ddofs,
        points=mesh.points, coarse_min_ndof=0, coarse_target=384,
    )
    assert rel < 1e-9
    assert np.linalg.norm(np.asarray(x) - dd) / np.linalg.norm(dd) < 1e-7


def test_steady_device_pcg_jacobi_only():
    """Without geometry (points=None) the PCG path must still converge via
    plain Jacobi + defect correction on a small, well-conditioned mesh."""
    from savtpu.solvers.steady import _steady_solve_pcg

    mesh, mat, edofs, Me, Ke, Fe, ddofs = _small_problem()
    ndof = mesh.num_dofs
    dd = np.asarray(steady_solve(Ke, Fe, edofs, ndof, ddofs))
    x, rel = _steady_solve_pcg(Ke, Fe, edofs, ndof, ddofs)
    assert rel < 1e-9
    assert np.linalg.norm(np.asarray(x) - dd) / np.linalg.norm(dd) < 1e-7


def test_explicit_matches_oracle_trajectory():
    cfg = Config()
    cfg.beam_cells = (4, 1, 1)
    cfg.beam_extent = (4.0, 1.0, 1.0)
    prob = setup_problem(cfg)
    ndof = prob.ndof
    K_nobc = np.asarray(assemble_dense(prob.Ke, prob.edofs, ndof))
    num_steps = 240
    traj_o = oracle.explicit_run(
        K_nobc,
        np.asarray(prob.F_pre),
        np.asarray(prob.lumped_M),
        np.asarray(prob.dirichlet_dofs),
        np.zeros(ndof),
        np.asarray(prob.dn),
        prob.dt,
        prob.alpha,
        num_steps,
        ramped=True,
    )
    for mode in ["dense", "ebe"]:
        op = FIntOperator(prob.Ke, prob.edofs, ndof, mode=mode)
        step = make_step_fn(
            op, prob.F_pre, prob.lumped_M, prob.mask, prob.alpha, prob.dt
        )
        traj, (d0, dn, tn) = run_explicit_jit(
            step, prob.d0, prob.dn, 0.0, prob.dt, num_steps
        )
        traj = np.asarray(traj)
        rel = np.linalg.norm(traj - traj_o) / np.linalg.norm(traj_o)
        assert rel < 1e-12, (mode, rel)
        assert abs(float(tn) - num_steps * prob.dt) < 1e-12


def test_save_every_semantics():
    cfg = Config()
    cfg.beam_cells = (3, 1, 1)
    cfg.beam_extent = (3.0, 1.0, 1.0)
    prob = setup_problem(cfg)
    op = FIntOperator(prob.Ke, prob.edofs, prob.ndof, mode="dense")
    step = make_step_fn(
        op, prob.F_pre, prob.lumped_M, prob.mask, prob.alpha, prob.dt
    )
    full, _ = run_explicit_jit(step, prob.d0, prob.dn, 0.0, prob.dt, 120, 1)
    strided, _ = run_explicit_jit(step, prob.d0, prob.dn, 0.0, prob.dt, 120, 4)
    # saved rows are steps i with i % 4 == 0 (Data_prepare.py:238-240)
    assert np.allclose(np.asarray(full)[::4], np.asarray(strided))


def test_ghost_step_zero_for_ramped_load():
    cfg = Config()
    cfg.beam_cells = (3, 1, 1)
    prob = setup_problem(cfg)
    # ramped load => F(0)=0, d0=v0=0 => dn = 0 (Data_prepare.py:182 comment)
    assert np.abs(np.asarray(prob.dn)).max() == 0.0


# ---------------- reference-mesh parity ----------------

def test_reference_mesh_parse_and_dt(reference_mesh_path):
    mesh = read_vtk(reference_mesh_path)
    assert mesh.num_points == 110
    assert mesh.tetra.shape == (256, 4)
    assert mesh.triangles.shape == (216, 3)
    dt = cfl_dt(mesh.tetra, mesh.points, 1e6, 1.0, 0.3, gamma=0.9)
    # hardcoded in the reference at Results/plotter.py:25
    assert abs(dt - 2.4784067462642383e-4) / 2.4784067462642383e-4 < 1e-12


def test_reference_mesh_steady_oracle(reference_mesh_path):
    mesh = read_vtk(reference_mesh_path)
    mat = LinearElastic.from_engineering(**MAT, ramped=False)
    coords = gather_coords(mesh.tetra, mesh.points)
    edofs = element_dofs(mesh.tetra)
    _, Ke, Fe = batch_element_mkf(1, 2, mat, 0.0, coords)
    dnodes = dirichlet_nodes(mesh.triangles, mesh.points)
    ddofs = node_to_dof(dnodes)
    d = np.asarray(steady_solve(Ke, Fe, edofs, mesh.num_dofs, ddofs))
    do = oracle.steady_solve(
        mesh.tetra, mesh.points, mat.lmd, mat.mu, mat.rho,
        np.array([0, -mat.fz, -mat.fz]), ddofs,
    )
    assert np.linalg.norm(d - do) / np.linalg.norm(do) < 1e-10
