"""Steady solve, ghost-step initialization, and modal analysis.

These are the reference's small dense LAPACK paths — Steady_Elasticity_solver
(Tools/Steady_solvers.py:13-22), the ghost-step Taylor init
(Data_prepare.py:179-189) and Eigen_mode (Steady_solvers.py:25-40) — kept as
dense jnp solves: they run once at setup on systems small enough that a
dense factorization is the right tool even on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..ops.precision import HIGHEST as _HIGHEST

from ..ops.assembly import apply_dirichlet_dense, assemble_dense, assemble_vector


def steady_solve(Ke, Fe, edofs, ndof: int, dirichlet_dofs):
    """Solve K d = F with strong Dirichlet (unit-diagonal rows).

    Equivalent to Global_Assembly(steady=True) + the row fix-up at
    Steady_solvers.py:16-22. Small systems use the dense jnp solve (the
    reference's LAPACK path); beyond ~6k DOFs the dense LU neither fits
    TPU VMEM nor makes sense, so the once-per-run solve drops to a host
    sparse direct factorization in f64 (setup-time host work, like the
    reference's rank-0 LAPACK)."""
    if ndof <= 6000:
        K = assemble_dense(Ke, edofs, ndof)
        F = assemble_vector(Fe, edofs, ndof)
        K, F = apply_dirichlet_dense(K, F, dirichlet_dofs)
        return jnp.linalg.solve(K, F)
    return _steady_solve_sparse_host(Ke, Fe, edofs, ndof, dirichlet_dofs)


def _steady_solve_sparse_host(Ke, Fe, edofs, ndof, dirichlet_dofs):
    import scipy.sparse as sps
    import scipy.sparse.linalg as spsla

    Ke_h = np.asarray(Ke, dtype=np.float64)
    ed = np.asarray(edofs)
    nb = ed.shape[1]
    rows = np.repeat(ed, nb, axis=1).reshape(-1)
    cols = np.tile(ed, (1, nb)).reshape(-1)
    K = sps.coo_matrix(
        (Ke_h.reshape(-1), (rows, cols)), shape=(ndof, ndof)
    ).tocsr()
    F = np.zeros(ndof)
    np.add.at(F, ed.reshape(-1), np.asarray(Fe, np.float64).reshape(-1))
    d = np.asarray(dirichlet_dofs)
    # unit-diagonal Dirichlet rows (Steady_solvers.py:16-21): zero the
    # rows/cols, set diag 1, zero the rhs entries
    keep = np.ones(ndof)
    keep[d] = 0.0
    Dk = sps.diags(keep)
    K = Dk @ K @ Dk + sps.diags(1.0 - keep)
    F *= keep
    x = spsla.spsolve(K.tocsc(), F)
    return jnp.asarray(x, dtype=jnp.asarray(Ke).dtype)


def ghost_step_init(Me, Ke, Fe_t0, edofs, ndof: int, dirichlet_dofs, d0, v0, dt: float):
    """d_{-1} = d0 - dt*v0 + dt^2/2 * a0 with a0 = M^{-1}(F(0) - K d0).

    M consistent (not lumped) with Dirichlet rows/cols zeroed and unit
    diagonal; K with Dirichlet rows/cols zeroed (diagonal left at zero);
    F(0) with Dirichlet rows zeroed — exactly the BC treatment of
    Data_prepare.py:179-189 on top of Global_Assembly's row/col skip."""
    d = jnp.asarray(dirichlet_dofs)
    M = assemble_dense(Me, edofs, ndof)
    K = assemble_dense(Ke, edofs, ndof)
    F = assemble_vector(Fe_t0, edofs, ndof)
    keep = jnp.ones((ndof,), dtype=M.dtype).at[d].set(0.0)
    M = M * keep[:, None] * keep[None, :]
    M = M.at[d, d].set(1.0)
    K = K * keep[:, None] * keep[None, :]
    F = F * keep
    a0 = jnp.linalg.solve(
        M, F - jnp.dot(K, d0, precision=_HIGHEST)
    )
    return d0 - dt * v0 + 0.5 * dt * dt * a0


def ghost_step_init_cg(
    Me, Ke, Fe_t0, edofs, ndof: int, dirichlet_dofs, d0, v0, dt: float,
    tol: float = 1e-12,
):
    """Matrix-free variant of ghost_step_init for large meshes: solves
    M a0 = F(0) - K d0 with jax.scipy CG on element-by-element operators
    (consistent M is SPD after the Dirichlet unit-diagonal treatment)."""
    import jax.scipy.sparse.linalg as jsla

    from ..ops.assembly import FIntOperator, dirichlet_mask

    keep = dirichlet_mask(ndof, dirichlet_dofs, dtype=d0.dtype)
    Mop = FIntOperator(Me, edofs, ndof, mode="ebe")
    Kop = FIntOperator(Ke, edofs, ndof, mode="ebe")
    F = assemble_vector(Fe_t0, edofs, ndof) * keep
    rhs = F - Kop(d0) * keep

    def mat(x):
        # M with Dirichlet rows/cols zeroed + unit diagonal
        return Mop(x * keep) * keep + x * (1.0 - keep)

    a0, _ = jsla.cg(mat, rhs, tol=tol, maxiter=500)
    return d0 - dt * v0 + 0.5 * dt * dt * a0


def eigen_modes(Me, Ke, edofs, ndof: int, dirichlet_dofs, num: int = 50):
    """First ``num`` natural frequencies (Hz) of K phi = w^2 M phi.

    Equivalent to Eigen_mode (Steady_solvers.py:25-40): Dirichlet rows/cols
    skipped, unit diagonal on M only — constrained DOFs appear as zero-
    frequency modes, exactly as in the reference's printed spectrum. Uses
    scipy.linalg.eigh on host — a once-per-mesh analysis utility, not a hot
    path."""
    from scipy.linalg import eigh

    d = np.asarray(dirichlet_dofs)
    M = np.asarray(assemble_dense(Me, edofs, ndof))
    K = np.asarray(assemble_dense(Ke, edofs, ndof))
    keep = np.ones(ndof)
    keep[d] = 0.0
    M = M * keep[:, None] * keep[None, :]
    K = K * keep[:, None] * keep[None, :]
    M[d, d] = 1.0
    omega_sq = eigh(K, M, eigvals_only=True)
    freqs = np.sqrt(np.maximum(omega_sq, 0.0)) / (2 * np.pi)
    return freqs[:num]


def steady_displacement(prob):
    """Steady displacement of an AssembledProblem under the full
    (unramped) load — the reference's Steady_Elasticity_solver entry
    (Data_prepare.py:158-168). Works for P1 and the steady-only P2 path."""
    import dataclasses as _dc

    from ..ops.element import batch_element_mkf

    mat = _dc.replace(prob.material, ramped=False)
    _, _, Fe = batch_element_mkf(prob.deg, prob.n_quad, mat, 0.0, prob.coords)
    return steady_solve(prob.Ke, Fe, prob.edofs, prob.ndof,
                        prob.dirichlet_dofs)
