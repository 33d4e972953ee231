"""Independent NumPy oracle for the FEM math.

A deliberately plain, loop-based float64 implementation of the published
element integrals and central-difference update (the same math contract as
the reference — see SURVEY.md §2.2-2.4), written from the equations. Used
only by tests as ground truth for the vmapped/jitted savtpu kernels.
"""

import numpy as np

# 4-point Gauss rule on the reference tetrahedron, weights sum to 1/6
_A, _B = 0.5854101966249685, 0.1381966011250105
QUAD_NODES = np.array(
    [[_A, _B, _B], [_B, _A, _B], [_B, _B, _A], [_B, _B, _B]]
)
QUAD_WEIGHTS = np.full(4, 0.25 / 6.0)


def voigt_D(lmd, mu):
    D = np.zeros((6, 6))
    D[:3, :3] = lmd
    D[0, 0] = D[1, 1] = D[2, 2] = lmd + 2 * mu
    D[3, 3] = D[4, 4] = D[5, 5] = mu
    return D


def p1_shape(xi):
    x, y, z = xi
    return np.array([1 - x - y - z, x, y, z])


P1_DERI = np.array(
    [[-1.0, -1.0, -1.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
)


def b_matrix(G):
    """B (6, 12) from physical gradients G (4, 3), Voigt (xx,yy,zz,yz,zx,xy)."""
    B = np.zeros((6, 12))
    for a in range(4):
        gx, gy, gz = G[a]
        c = 3 * a
        B[0, c] = gx
        B[1, c + 1] = gy
        B[2, c + 2] = gz
        B[3, c + 1] = gz
        B[3, c + 2] = gy
        B[4, c] = gz
        B[4, c + 2] = gx
        B[5, c] = gy
        B[5, c + 1] = gx
    return B


def element_mkf(P, lmd, mu, rho, fvec):
    """(M, K, F) of one P1 tet; fvec is the (already ramped) body force."""
    D = voigt_D(lmd, mu)
    M = np.zeros((12, 12))
    K = np.zeros((12, 12))
    F = np.zeros(12)
    for q in range(4):
        xi, w = QUAD_NODES[q], QUAD_WEIGHTS[q]
        N = p1_shape(xi)
        J = P.T @ P1_DERI
        detJ = np.linalg.det(J)
        G = P1_DERI @ np.linalg.inv(J)
        B = b_matrix(G)
        K += B.T @ D @ B * detJ * w
        Mbar = np.outer(N, N) * rho * detJ * w
        M += np.kron(Mbar, np.eye(3))
        for a in range(4):
            F[3 * a : 3 * a + 3] += N[a] * fvec * detJ * w
    return M, K, F


def global_assembly_nobc(cells, points, lmd, mu, rho, fvec):
    ndof = 3 * len(points)
    M = np.zeros((ndof, ndof))
    K = np.zeros((ndof, ndof))
    F = np.zeros(ndof)
    for ele in cells:
        P = points[ele]
        Me, Ke, Fe = element_mkf(P, lmd, mu, rho, fvec)
        dofs = np.concatenate([3 * n + np.arange(3) for n in ele])
        for p in range(12):
            F[dofs[p]] += Fe[p]
            for q in range(12):
                M[dofs[p], dofs[q]] += Me[p, q]
                K[dofs[p], dofs[q]] += Ke[p, q]
    return M, K, F


def apply_bc(K, F, ddofs):
    K = K.copy()
    F = F.copy()
    K[ddofs, :] = 0.0
    K[:, ddofs] = 0.0
    K[ddofs, ddofs] = 1.0
    F[ddofs] = 0.0
    return K, F


def steady_solve(cells, points, lmd, mu, rho, fvec, ddofs):
    _, K, F = global_assembly_nobc(cells, points, lmd, mu, rho, fvec)
    K, F = apply_bc(K, F, ddofs)
    return np.linalg.solve(K, F)


def explicit_run(
    K_nobc, F_pre, lumped_M, ddofs, d0, dn, dt, alpha, num_steps, ramped=True
):
    """Plain-loop central-difference run; returns (num_steps, ndof)."""
    lM = lumped_M
    traj = np.zeros((num_steps, len(d0)))
    tn = 0.0
    for i in range(num_steps):
        F_int = K_nobc @ d0
        ramp = min(tn, 1.0) if ramped else 1.0
        F_ext = F_pre * ramp
        d1 = (
            dt * dt * (F_ext - F_int)
            + 2 * lM * d0
            - lM * dn
            + 0.5 * dt * alpha * lM * dn
        ) / (lM + 0.5 * alpha * dt * lM)
        d1[ddofs] = 0.0
        traj[i] = d1
        dn, d0 = d0, d1
        tn += dt
    return traj
