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
    x, rel = _steady_solve_device_pcg(
        Ke, Fe, edofs, ndof, dirichlet_dofs, points=points
    )
    if rel <= 1e-8:
        return x
    # PCG stagnated (pathological conditioning) — fall back to the host
    # sparse direct factorization, accuracy over speed.
    return _steady_solve_sparse_host(Ke, Fe, edofs, ndof, dirichlet_dofs)


def _steady_solve_device_pcg(
    Ke,
    Fe,
    edofs,
    ndof: int,
    dirichlet_dofs,
    points=None,
    rtol: float = 1e-10,
    rounds: int = 8,
    maxiter: int = 30_000,
    coarse_target: int = 4096,
    coarse_min_ndof: int = 20_000,
    verbose: bool = False,
):
    """Two-level PCG on the accelerator + f64 defect correction.

    The once-per-run steady solve is the setup whale at scale: host SuperLU
    on the 384x16x16 beam (334k DOFs) takes ~27 min on this machine, 70% of
    total setup. The TPU-native replacement runs CG entirely on the device
    with the element-by-element operator (gather -> batched element matvec
    -> segment_sum; no global matrix is ever formed), preconditioned by

        M^-1 = D^-1 + P K_c^-1 P^T        (additive two-level Schwarz)

    where P is trilinear interpolation from a regular coarse grid laid over
    the mesh bounding box (geometry-only — no mesh structure assumed) and
    K_c = P^T A P is the Galerkin coarse matrix, built on-device by applying
    the EBE operator to batched coarse basis columns and factorized once on
    the host in f64 (<= ``coarse_target`` DOFs — the same size class as the
    reference's own dense LAPACK solves). The coarse space carries the slow
    bending modes of the slender beam that make plain Jacobi-CG stall
    (kappa ~ (L/t)^2 (L/h)^2); with it the iteration count drops to O(100).

    f64-grade accuracy comes from defect correction: the residual
    r = F - K x is recomputed on the host in float64 between CG rounds and
    the device solves the (rescaled) correction system in f32. Returns
    ``(x, final_rel_residual)`` — the caller falls back to the host direct
    solve if PCG stagnated above tolerance.

    BC treatment identical to the direct path (Steady_solvers.py:16-21):
    rows/cols of Dirichlet DOFs zeroed, unit diagonal, zero rhs.
    """
    import numpy as np_
    import jax
    from jax import lax

    ed = np_.asarray(edofs)
    Ke64 = np_.asarray(Ke, dtype=np_.float64)
    # host f64 reference data: rhs, Dirichlet mask, Jacobi diagonal
    F64 = np_.zeros(ndof)
    np_.add.at(F64, ed.reshape(-1), np_.asarray(Fe, np_.float64).reshape(-1))
    keep64 = np_.ones(ndof)
    keep64[np_.asarray(dirichlet_dofs)] = 0.0
    F64 *= keep64
    diag64 = np_.zeros(ndof)
    nb3 = ed.shape[1]
    diag_e = Ke64[:, np_.arange(nb3), np_.arange(nb3)]
    np_.add.at(diag64, ed.reshape(-1), diag_e.reshape(-1))
    diag64 = keep64 * diag64 + (1.0 - keep64)  # unit diagonal on BC rows

    def matvec64(x):
        d_e = (x * keep64)[ed]
        f_e = np_.einsum("eij,ej->ei", Ke64, d_e)
        out = np_.zeros(ndof)
        np_.add.at(out, ed.reshape(-1), f_e.reshape(-1))
        return keep64 * out + (1.0 - keep64) * x

    # device arrays (run dtype of Ke — f32 on TPU, f64 under x64/CPU).
    # Everything sizable is passed to the jitted functions through the
    # ``consts`` pytree ARGUMENT, never closure-captured: captured arrays
    # get embedded into the HLO as literals, and at 590k elements the
    # 340 MB element-stiffness constant overflows the remote-compile
    # request (HTTP 413 over the TPU tunnel).
    dev_dtype = jnp.asarray(Ke).dtype
    consts = {
        "Ke": jnp.asarray(Ke),
        "ed": jnp.asarray(ed, dtype=jnp.int32),
        "keep": jnp.asarray(keep64, dtype=dev_dtype),
        "invdiag": jnp.asarray(1.0 / diag64, dtype=dev_dtype),
    }

    def A(x, c):
        keep_d = c["keep"]
        xm = x * keep_d
        f_e = jnp.sum(c["Ke"] * xm[c["ed"]][:, None, :], axis=-1)
        out = jax.ops.segment_sum(
            f_e.reshape(-1), c["ed"].reshape(-1), num_segments=ndof
        )
        return keep_d * out + (1.0 - keep_d) * x

    # ---- two-level coarse space (geometry-only trilinear coarsening) ----
    apply_coarse = None
    if points is not None and ndof > coarse_min_ndof:
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
        consts["cidx"] = jnp.asarray(cidx, dtype=jnp.int32)
        consts["w"] = jnp.asarray(w, dtype=dev_dtype)

        def P_apply(xc, c):  # (n_coarse, 3) -> (ndof,)
            # precision=HIGHEST: einsum lowers to an MXU dot whose default
            # single-bf16-pass product injects O(1e-2) relative error —
            # enough to make the preconditioner indefinite and blow up CG
            # (third instance of this failure mode: ops/precision.py,
            # models/linear.py)
            xf = jnp.einsum(
                "nk,nkc->nc", c["w"], xc[c["cidx"]], precision=_HIGHEST
            )
            return xf.reshape(-1)

        def Pt_apply(r, c):  # (ndof,) -> (n_coarse, 3)
            rn = r.reshape(-1, 3)
            contrib = c["w"][:, :, None] * rn[:, None, :]  # (Nf, 8, 3)
            return jax.ops.segment_sum(
                contrib.reshape(-1, 3),
                c["cidx"].reshape(-1),
                num_segments=n_coarse,
            )

        # Galerkin coarse matrix K_c = P~^T A P~ built on-device in
        # batched column chunks (the EBE matvec batches on the MXU)
        def A_mat(X, c):  # (ndof, m)
            keep_d = c["keep"]
            Xm = X * keep_d[:, None]
            d_e = Xm[c["ed"]]  # (E, 3nb, m)
            f_e = jnp.einsum(
                "eij,ejm->eim", c["Ke"], d_e, precision=_HIGHEST
            )
            out = jax.ops.segment_sum(
                f_e.reshape(-1, X.shape[1]),
                c["ed"].reshape(-1),
                num_segments=ndof,
            )
            return keep_d[:, None] * out + (1.0 - keep_d)[:, None] * X

        @jax.jit
        def kc_chunk(eye_chunk, c):  # (n_coarse*3, m) coarse identity
            cols = jax.vmap(
                lambda e: P_apply(e.reshape(n_coarse, 3), c), out_axes=1
            )(eye_chunk.T)
            Y = A_mat(cols, c)
            return jax.vmap(
                lambda y: Pt_apply(y, c).reshape(-1), in_axes=1
            )(Y).T

        nc_dof = 3 * n_coarse
        m = 64
        if verbose:
            import time as _time

            print(
                f"[pcg] coarse grid {ncx}x{ncy}x{ncz} nc_dof={nc_dof}",
                flush=True,
            )
            _t0 = _time.perf_counter()
        Kc = np_.zeros((nc_dof, nc_dof))
        for s in range(0, nc_dof, m):
            e = min(s + m, nc_dof)
            eye = np_.zeros((nc_dof, m), dtype=np_.float32)
            eye[np_.arange(s, e), np_.arange(e - s)] = 1.0
            blk = np_.asarray(
                kc_chunk(jnp.asarray(eye, dtype=dev_dtype), consts),
                dtype=np_.float64,
            )
            Kc[:, s:e] = blk[:, : e - s]
        if verbose:
            print(
                f"[pcg] Kc build {_time.perf_counter() - _t0:.1f}s",
                flush=True,
            )
            _t0 = _time.perf_counter()
        if verbose:
            asym = np_.linalg.norm(Kc - Kc.T) / max(
                np_.linalg.norm(Kc), 1e-30
            )
            print(f"[pcg] Kc asymmetry {asym:.2e}", flush=True)
        Kc = 0.5 * (Kc + Kc.T)
        # The coarse inverse must stay SPD under f32 rounding: a rounded
        # explicit inverse can be INDEFINITE (perturbation ~eps*kappa in
        # the small eigenvalues), which breaks CG. Apply it as W (W^T r)
        # — PSD by construction in any precision — with W = L^{-T} from a
        # host f64 Cholesky K_c = L L^T (a small diagonal jitter absorbs
        # the f32 build noise and gives unsupported coarse nodes a
        # decoupled eps diagonal; their residual components are exact
        # zeros so they never activate). Falls back to a truncated
        # eigenfactorization if Cholesky keeps failing.
        W = None
        diag_scale = max(float(np_.trace(Kc)) / nc_dof, 1e-30)
        for jit_eps in (1e-10, 1e-7, 1e-4):
            try:
                from scipy.linalg import cholesky as _chol
                from scipy.linalg import lapack as _lapack

                Kc_j = Kc.copy()
                Kc_j[np_.arange(nc_dof), np_.arange(nc_dof)] += (
                    jit_eps * diag_scale
                )
                L = _chol(Kc_j, lower=True)
                Linv, info = _lapack.dtrtri(L, lower=1)
                if info != 0:
                    continue
                W = Linv.T
                break
            except np_.linalg.LinAlgError:
                continue
        if W is None:  # pragma: no cover - pathological build noise
            lam, V = np_.linalg.eigh(Kc)
            lam_max = float(lam[-1]) if len(lam) else 1.0
            keep_modes = lam > 1e-12 * max(lam_max, 1e-30)
            W = V[:, keep_modes] / np_.sqrt(lam[keep_modes])
        if verbose:
            print(f"[pcg] coarse factor W {W.shape}", flush=True)
        consts["W"] = jnp.asarray(W, dtype=dev_dtype)

        def apply_coarse(r, c):
            rc = Pt_apply(r, c).reshape(-1)
            yc = jnp.dot(c["W"].T, rc, precision=_HIGHEST)
            zc = jnp.dot(c["W"], yc, precision=_HIGHEST)
            return P_apply(zc.reshape(n_coarse, 3), c)

    if apply_coarse is None:
        Minv = lambda r, c: r * c["invdiag"]
    else:
        Minv = lambda r, c: r * c["invdiag"] + apply_coarse(r, c)

    if verbose:  # self-check: device operator vs host f64, symmetry
        rng = np_.random.default_rng(0)
        u = rng.standard_normal(ndof)
        v = rng.standard_normal(ndof)
        u_d = jnp.asarray(u, dtype=dev_dtype)
        v_d = jnp.asarray(v, dtype=dev_dtype)
        Au_d = np_.asarray(A(u_d, consts), np_.float64)
        Au_h = matvec64(u)
        Av_d = np_.asarray(A(v_d, consts), np_.float64)
        Mu = np_.asarray(Minv(u_d, consts), np_.float64)
        Mv = np_.asarray(Minv(v_d, consts), np_.float64)
        print(
            f"[pcg] check |A_dev-A_host|/|A_host|="
            f"{np_.linalg.norm(Au_d - Au_h) / np_.linalg.norm(Au_h):.2e}"
            f"  <u,Av>/<Au,v>-1={u @ Av_d / (Au_d @ v) - 1:.2e}"
            f"  <u,Mv>/<Mu,v>-1={u @ Mv / (Mu @ v) - 1:.2e}"
            f"  <u,Mu>={u @ Mu:.3e}",
            flush=True,
        )
        vd = float(jnp.vdot(u_d, v_d))
        print(
            f"[pcg] check vdot rel err={abs(vd - u @ v) / abs(u @ v):.2e}",
            flush=True,
        )

    # PCG with exact state carried across bounded dispatches: one long
    # while_loop dispatch reproducibly crashes the remote TPU worker (the
    # same fault as >25k-step solver dispatches, docs/STATUS_r3.md), so
    # each jit call runs a fixed fori_loop chunk of iterations and the
    # host loop re-dispatches from the returned (x, r, z, p, rz) state —
    # mathematically identical to unchunked CG, unlike a restarted CG.
    chunk = 250

    @jax.jit
    def pcg_chunk(state, c):
        def body(_, s):
            x, r, z, p, rz, done = s
            Ap = A(p, c)
            pAp = jnp.vdot(p, Ap)
            # TOTAL freeze once converged/stalled inside the fixed chunk:
            # rz/pAp underflow to 0 when f32 convergence bottoms out, and
            # resuming with ANY recomputed quantity against a stale rz
            # takes garbage steps that blow the residual up exponentially
            # (observed 1e18 in one 250-iteration chunk) — so past `done`,
            # every carry component is held exactly as-is.
            done = done | ~jnp.isfinite(pAp) | (pAp <= 0.0) | (rz <= 0.0)
            safe = lambda q: jnp.where(done, 1.0, q)
            alpha = jnp.where(done, 0.0, rz / safe(pAp))
            x = x + alpha * p
            r_new = jnp.where(done, r, r - alpha * Ap)
            z_new = jnp.where(done, z, Minv(r_new, c))
            rz_new = jnp.vdot(r_new, z_new)
            beta = jnp.where(done, 0.0, rz_new / safe(rz))
            p_new = jnp.where(done, p, z_new + beta * p)
            return (
                x,
                r_new,
                z_new,
                p_new,
                jnp.where(done, rz, rz_new),
                done,
            )

        return lax.fori_loop(0, chunk, body, state)

    def cg_round(rhs, inner_tol=1e-7):
        x0 = jnp.zeros_like(rhs)
        z0 = Minv(rhs, consts)
        state = (x0, rhs, z0, z0, jnp.vdot(rhs, z0),
                 jnp.asarray(False))
        nb = float(np_.linalg.norm(np_.asarray(rhs, np_.float64)))
        prev = np_.inf
        for _ in range(max(1, maxiter // chunk)):
            state = pcg_chunk(state, consts)
            rn = float(
                np_.linalg.norm(np_.asarray(state[1], np_.float64))
            )
            if verbose:
                print(f"[pcg]   chunk rel={rn / nb:.3e}", flush=True)
            if not np_.isfinite(rn) or rn <= inner_tol * nb:
                break
            if bool(np_.asarray(state[5])):  # frozen: f32 floor reached
                break
            if rn > 0.97 * prev:  # f32 stagnation — defect-correct instead
                break
            prev = rn
        return state[0]

    x = np_.zeros(ndof)
    nF = np_.linalg.norm(F64)
    rel = 1.0
    for _ in range(rounds):
        r = F64 - matvec64(x)
        rel = float(np_.linalg.norm(r) / nF)
        if verbose:
            print(f"[pcg] round rel-resid={rel:.3e}", flush=True)
        if rel <= rtol:
            break
        # rescale the correction system to O(1) so f32 CG keeps full
        # significand resolution regardless of how small r has become
        s = float(np_.linalg.norm(r))
        z = cg_round(jnp.asarray(r / s, dtype=dev_dtype))
        x_new = x + s * np_.asarray(z, dtype=np_.float64)
        rel_new = float(
            np_.linalg.norm(F64 - matvec64(x_new)) / nF
        )
        if not np_.isfinite(rel_new) or rel_new >= rel:
            break  # round made things worse — keep x, caller may fall back
        x, rel = x_new, rel_new
    return jnp.asarray(x, dtype=dev_dtype), rel


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
                        prob.dirichlet_dofs, points=prob.mesh.points)
