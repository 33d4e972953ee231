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


def steady_solve(Ke, Fe, edofs, ndof: int, dirichlet_dofs, points=None):
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
    x, rel = _steady_solve_pcg(
        Ke, Fe, edofs, ndof, dirichlet_dofs, points=points
    )
    # Accept anything at or below the f64 conditioning floor: the
    # attainable residual of ANY f64 solve (iterative or LU) is
    # ~eps_f64*kappa(K) — at 384x16x16 (kappa ~ 5e8) that is ~1e-7, and
    # falling back to the 27-min SuperLU cannot beat it. 1e-6 matches
    # the framework's parity north star (BASELINE.md).
    if rel <= 1e-6:
        return x
    # PCG stagnated (pathological conditioning) — fall back to the host
    # sparse direct factorization, accuracy over speed.
    return _steady_solve_sparse_host(Ke, Fe, edofs, ndof, dirichlet_dofs)


def _steady_solve_pcg(
    Ke,
    Fe,
    edofs,
    ndof: int,
    dirichlet_dofs,
    points=None,
    rtol: float = 1e-10,
    maxiter: int = 20_000,
    coarse_target: int = 4096,
    coarse_min_ndof: int = 20_000,
    verbose: bool = False,
):
    """Two-level preconditioned CG for the once-per-run steady solve.

    The steady solve is the setup whale at scale: host SuperLU on the
    384x16x16 beam (334k DOFs) takes ~27 min on this machine, 70% of
    total setup. This replaces the factorization with CG on the
    assembled sparse operator, preconditioned by

        M^-1 = D^-1 + P K_c^-1 P^T        (additive two-level Schwarz)

    where P is trilinear interpolation from a regular coarse grid laid
    over the mesh bounding box (geometry-only -- no mesh structure
    assumed) and K_c = P^T K P is the Galerkin coarse matrix, Cholesky-
    factorized once (<= ``coarse_target`` DOFs -- the same size class as
    the reference's dense LAPACK solves). The coarse space carries the
    slow bending modes of the slender beam that make plain Jacobi-CG
    stall (kappa ~ (L/t)^2 (L/h)^2); with it the iteration count drops
    to O(100) and the 27-min solve to ~2 min.

    The ITERATION runs on the host in float64, deliberately. A TPU f32
    implementation (EBE matvec on the MXU, chunked device CG, f64 defect
    correction between rounds) was built first and is precision-
    infeasible at the scale that motivates PCG at all: the relative
    residual floor of CG in finite precision is ~eps*kappa(K), and at
    384x16x16 kappa ~ 5e8 puts the f32 floor at ~30 -- the measured
    stall was rel-resid 32 from any starting point, with the recursive
    residual meaninglessly telescoping to 1e-15. No preconditioner fixes
    arithmetic: the coarse directions the solve must resolve are born
    below f32 rounding of the matvec. (At 96x8x8, kappa is 64x smaller
    and the same device loop converged -- borderline, not robust.) Setup
    host work in f64 matches the reference's own rank-0 LAPACK posture.

    BC treatment identical to the direct path (Steady_solvers.py:16-21):
    rows/cols of Dirichlet DOFs zeroed, unit diagonal, zero rhs.
    Returns ``(x, final_rel_residual)`` -- the caller falls back to the
    host direct solve if PCG stagnated above tolerance.
    """
    import time as _time

    import numpy as np_
    import scipy.sparse as sps
    from scipy.linalg import cho_factor, cho_solve

    t0 = _time.perf_counter()
    ed = np_.asarray(edofs, dtype=np_.int32)  # int32 halves the COO sort
    Ke64 = np_.asarray(Ke, dtype=np_.float64)
    if verbose:
        print(
            f"[pcg] Ke device->host {_time.perf_counter() - t0:.1f}s",
            flush=True,
        )
    nb3 = ed.shape[1]
    rows = np_.repeat(ed, nb3, axis=1).reshape(-1)
    cols = np_.tile(ed, (1, nb3)).reshape(-1)
    Ksp = sps.coo_matrix(
        (Ke64.reshape(-1), (rows, cols)), shape=(ndof, ndof)
    ).tocsr()
    keep64 = np_.ones(ndof)
    keep64[np_.asarray(dirichlet_dofs)] = 0.0
    Dk = sps.diags(keep64)
    Ksp = Dk @ Ksp @ Dk + sps.diags(1.0 - keep64)
    F64 = np_.zeros(ndof)
    np_.add.at(F64, ed.reshape(-1), np_.asarray(Fe, np_.float64).reshape(-1))
    F64 *= keep64
    invdiag = 1.0 / Ksp.diagonal()
    if verbose:
        print(
            f"[pcg] sparse K assembly {_time.perf_counter() - t0:.1f}s "
            f"nnz={Ksp.nnz}",
            flush=True,
        )

    # ---- two-level coarse space (geometry-only trilinear coarsening) ----
    apply_coarse = None
    if points is not None and ndof > coarse_min_ndof:
        t0 = _time.perf_counter()
        pts = np_.asarray(points, dtype=np_.float64)
        lo, hi = pts.min(axis=0), pts.max(axis=0)
        span = np_.maximum(hi - lo, 1e-12)
        # grid resolution proportional to bbox dims, ~coarse_target DOFs
        n_nodes_target = max(coarse_target // 3, 8)
        scale = (n_nodes_target / float(np_.prod(span))) ** (1.0 / 3.0)
        cdims = np_.maximum((span * scale).astype(int), 1)  # cells per axis
        while np_.prod(cdims + 1) * 3 > coarse_target * 1.5:
            cdims = np_.maximum(cdims - 1, 1)
        ncx, ncy, ncz = (int(c) for c in cdims)
        n_coarse = (ncx + 1) * (ncy + 1) * (ncz + 1)
        # trilinear weights of each fine node in its coarse cell
        u = (pts - lo) / span * cdims  # in [0, cdims]
        cell = np_.minimum(u.astype(int), cdims - 1)
        frac = u - cell
        strides = np_.array(
            [(ncy + 1) * (ncz + 1), ncz + 1, 1], dtype=np_.int64
        )
        corners = np_.array(
            [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)],
            dtype=np_.int64,
        )  # (8, 3)
        cidx = ((cell[:, None, :] + corners[None, :, :]) * strides).sum(
            -1
        )  # (Nf, 8) coarse node ids
        wxyz = np_.stack(
            [1.0 - frac, frac], axis=2
        )  # (Nf, 3, 2) 1D weights
        w = (
            wxyz[:, 0, corners[:, 0]]
            * wxyz[:, 1, corners[:, 1]]
            * wxyz[:, 2, corners[:, 2]]
        )  # (Nf, 8)
        nc_dof = 3 * n_coarse
        Nf = pts.shape[0]
        rP = np_.broadcast_to(
            3 * np_.arange(Nf)[:, None, None] + np_.arange(3)[None, None, :],
            (Nf, 8, 3),
        ).reshape(-1)
        cP = (3 * cidx[:, :, None] + np_.arange(3)[None, None, :]).reshape(-1)
        vP = np_.broadcast_to(w[:, :, None], (Nf, 8, 3)).reshape(-1)
        Pmat = sps.coo_matrix(
            (vP, (rP, cP)), shape=(ndof, nc_dof)
        ).tocsr()
        Kc = (Pmat.T @ (Ksp @ Pmat)).toarray()
        Kc = 0.5 * (Kc + Kc.T)
        # Coarse grid nodes whose trilinear support contains no fine
        # node (possible when fine nodes align exactly with coarse
        # gridlines) give zero rows -- a small diagonal jitter decouples
        # them; their residual components are exact zeros so they never
        # activate. The ladder absorbs any residual semi-definiteness.
        diag_scale = max(float(np_.trace(Kc)) / nc_dof, 1e-30)
        factor = None
        for jit_eps in (1e-12, 1e-9, 1e-6):
            try:
                Kc_j = Kc.copy()
                Kc_j[np_.arange(nc_dof), np_.arange(nc_dof)] += (
                    jit_eps * diag_scale
                )
                factor = cho_factor(Kc_j, lower=True)
                break
            except np_.linalg.LinAlgError:
                continue
        if factor is None:  # pragma: no cover - pathological build noise
            lam, V = np_.linalg.eigh(Kc)
            lam_max = float(lam[-1]) if len(lam) else 1.0
            keep_modes = lam > 1e-12 * max(lam_max, 1e-30)
            W = V[:, keep_modes] / np_.sqrt(lam[keep_modes])

            def apply_coarse(r):
                return Pmat @ (W @ (W.T @ (Pmat.T @ r)))

        else:

            def apply_coarse(r):
                return Pmat @ cho_solve(factor, Pmat.T @ r)

        if verbose:
            print(
                f"[pcg] coarse grid {ncx}x{ncy}x{ncz} nc_dof={nc_dof} "
                f"built+factored {_time.perf_counter() - t0:.1f}s",
                flush=True,
            )

    if apply_coarse is None:
        Minv = lambda r: r * invdiag
    else:
        Minv = lambda r: r * invdiag + apply_coarse(r)

    # standard host-f64 PCG; the recursive residual is trustworthy here
    # (periodic true-residual refresh guards the long tail regardless)
    x = np_.zeros(ndof)
    r = F64.copy()
    nF = float(np_.linalg.norm(F64))
    if nF == 0.0:
        return jnp.asarray(x, dtype=jnp.asarray(Ke).dtype), 0.0
    z = Minv(r)
    p = z.copy()
    rz = float(r @ z)
    rel = 1.0
    t0 = _time.perf_counter()
    for it in range(maxiter):
        Ap = Ksp @ p
        pAp = float(p @ Ap)
        if not np_.isfinite(pAp) or pAp <= 0.0:
            break
        alpha = rz / pAp
        x += alpha * p
        r -= alpha * Ap
        if (it + 1) % 200 == 0:
            r = F64 - Ksp @ x  # refresh against recursion drift
        rel = float(np_.linalg.norm(r) / nF)
        if verbose and (it + 1) % 100 == 0:
            print(f"[pcg]   it {it + 1} rel={rel:.3e}", flush=True)
        if rel <= rtol:
            break
        z = Minv(r)
        rz_new = float(r @ z)
        p = z + (rz_new / rz) * p
        rz = rz_new
    rel = float(np_.linalg.norm(F64 - Ksp @ x) / nF)
    if verbose:
        print(
            f"[pcg] {it + 1} iterations, rel={rel:.3e}, "
            f"{_time.perf_counter() - t0:.1f}s",
            flush=True,
        )
    return jnp.asarray(x, dtype=jnp.asarray(Ke).dtype), rel



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
    # jit so XLA dead-code-eliminates the unused (E, 12, 12) M and K
    # tensors — the eager call materialized them and OOMed past ~1M
    # elements (see setup_problem's chunked pass)
    import jax as _jax

    Fe = _jax.jit(
        lambda c: batch_element_mkf(prob.deg, prob.n_quad, mat, 0.0, c)[2]
    )(prob.coords)
    return steady_solve(prob.Ke, Fe, prob.edofs, prob.ndof,
                        prob.dirichlet_dofs, points=prob.mesh.points)
