"""Vmapped element kernels: per-element mass, stiffness and force.

The reference computes these with quadruple-nested Python loops per element
(Tools/Mat_construction.py:23-119, ``Local_MKF`` / ``Local_K_coronary``).
Here one pure function produces the (3nb, 3nb)/(3nb,) element arrays for a
single element and ``jax.vmap`` lifts it over the whole (E, nb, 3)
coordinate tensor — one fused XLA computation instead of E Python loops.
The integrals are identical: K_e = sum_q B^T D B detJ w_q,
M_e = sum_q rho N_i N_j detJ w_q (x I3), F_e = sum_q N_i f(X_q, t) detJ w_q.
"""

from __future__ import annotations

import jax

from .precision import with_fem_precision
import jax.numpy as jnp
import numpy as np

from .quadrature import tet_quadrature
from .shape import isoparametric_map, jacobian, n_basis, shape_derivative, shape_function


def det3(J):
    """Closed-form 3x3 determinant (no LAPACK — runs on TPU in any dtype,
    and vmaps to a handful of VPU ops per element)."""
    return (
        J[0, 0] * (J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1])
        - J[0, 1] * (J[1, 0] * J[2, 2] - J[1, 2] * J[2, 0])
        + J[0, 2] * (J[1, 0] * J[2, 1] - J[1, 1] * J[2, 0])
    )


def inv3(J, detJ=None):
    """Closed-form 3x3 inverse via the adjugate."""
    if detJ is None:
        detJ = det3(J)
    adj = jnp.array(
        [
            [
                J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1],
                J[0, 2] * J[2, 1] - J[0, 1] * J[2, 2],
                J[0, 1] * J[1, 2] - J[0, 2] * J[1, 1],
            ],
            [
                J[1, 2] * J[2, 0] - J[1, 0] * J[2, 2],
                J[0, 0] * J[2, 2] - J[0, 2] * J[2, 0],
                J[0, 2] * J[1, 0] - J[0, 0] * J[1, 2],
            ],
            [
                J[1, 0] * J[2, 1] - J[1, 1] * J[2, 0],
                J[0, 1] * J[2, 0] - J[0, 0] * J[2, 1],
                J[0, 0] * J[1, 1] - J[0, 1] * J[1, 0],
            ],
        ]
    )
    return adj / detJ


def strain_displacement(G):
    """Voigt strain-displacement matrix B (6, 3*nb) from physical gradients
    G (nb, 3); ordering (xx, yy, zz, yz, zx, xy) as in
    Mat_construction.py:48-54."""
    Z = jnp.zeros_like(G[:, 0])
    gx, gy, gz = G[:, 0], G[:, 1], G[:, 2]
    Ba = jnp.stack(
        [
            jnp.stack([gx, Z, Z], axis=-1),
            jnp.stack([Z, gy, Z], axis=-1),
            jnp.stack([Z, Z, gz], axis=-1),
            jnp.stack([Z, gz, gy], axis=-1),
            jnp.stack([gz, Z, gx], axis=-1),
            jnp.stack([gy, gx, Z], axis=-1),
        ],
        axis=1,
    )  # (nb, 6, 3)
    nb = G.shape[0]
    return Ba.transpose(1, 0, 2).reshape(6, 3 * nb)


def _quad_points(deg: int, n_quad: int, dtype):
    nodes, weights = tet_quadrature(n_quad)
    return (
        jnp.asarray(nodes, dtype=dtype),
        jnp.asarray(weights, dtype=dtype),
    )


def element_mkf(deg: int, n_quad: int, material, t, P):
    """(M_e, K_e, F_e) for one element with nodal coordinates P (nb, 3).

    Equivalent to Local_MKF (Mat_construction.py:23-76). ``t`` may be a
    traced scalar (the load ramp is the only time dependence)."""
    nb = n_basis(deg)
    dtype = P.dtype
    nodes, weights = _quad_points(deg, n_quad, dtype)
    D = material.D(dtype)

    K = jnp.zeros((3 * nb, 3 * nb), dtype=dtype)
    Mbar = jnp.zeros((nb, nb), dtype=dtype)
    F = jnp.zeros((3 * nb,), dtype=dtype)
    for q in range(nodes.shape[0]):
        xi, w = nodes[q], weights[q]
        N = shape_function(deg, xi)
        dN = shape_derivative(deg, xi)
        J = jacobian(P, dN)
        detJ = det3(J)
        G = dN @ inv3(J, detJ)
        B = strain_displacement(G)
        K = K + (B.T @ D @ B) * detJ * w
        Mbar = Mbar + jnp.outer(N, N) * (material.rho * detJ * w)
        X = isoparametric_map(P, N)
        f = material.body_force(X, t, dtype)
        F = F + (N[:, None] * f[None, :]).reshape(-1) * detJ * w
    M = jnp.kron(Mbar, jnp.eye(3, dtype=dtype))
    return M, K, F


def element_k(deg: int, n_quad: int, material, P):
    """Stiffness only (Local_K_coronary, Mat_construction.py:79-119)."""
    nb = n_basis(deg)
    dtype = P.dtype
    nodes, weights = _quad_points(deg, n_quad, dtype)
    D = material.D(dtype)
    K = jnp.zeros((3 * nb, 3 * nb), dtype=dtype)
    for q in range(nodes.shape[0]):
        xi, w = nodes[q], weights[q]
        dN = shape_derivative(deg, xi)
        J = jacobian(P, dN)
        detJ = det3(J)
        G = dN @ inv3(J, detJ)
        B = strain_displacement(G)
        K = K + (B.T @ D @ B) * detJ * w
    return K


@with_fem_precision
def batch_element_mkf(deg: int, n_quad: int, material, t, coords):
    """Vmapped element integrals over coords (E, nb, 3):
    returns (M (E,3nb,3nb), K (E,3nb,3nb), F (E,3nb))."""
    fn = lambda P: element_mkf(deg, n_quad, material, t, P)
    return jax.vmap(fn)(coords)


@with_fem_precision
def batch_element_k(deg: int, n_quad: int, material, coords):
    fn = lambda P: element_k(deg, n_quad, material, P)
    return jax.vmap(fn)(coords)


def gather_coords(cells: np.ndarray, points: np.ndarray, dtype=None):
    """(E, nb, 3) element coordinate tensor from connectivity."""
    coords = np.asarray(points)[np.asarray(cells)]
    if dtype is not None:
        coords = coords.astype(dtype)
    return jnp.asarray(coords)


@with_fem_precision
def neo_hookean_element_fint(material, P, d_e):
    """Internal force (3nb,) of one P1 tet under Neo-Hookean stress, for the
    nonlinear matrix-free stepper. P (4,3) reference coords, d_e (12,)
    nodal displacements.

    P1 shape gradients are constant, so the whole integrand (deformation
    gradient, first Piola stress) is constant over the element — one
    evaluation times the total quadrature weight replaces the 4-point
    loop (4x fewer inv3/log evaluations in the hot nonlinear stepper)."""
    dtype = P.dtype
    nodes, weights = _quad_points(1, 2, dtype)
    u = d_e.reshape(4, 3)
    dN = shape_derivative(1, nodes[0])
    J = jacobian(P, dN)
    detJ = det3(J)
    G = dN @ inv3(J, detJ)  # (4, 3) physical gradients
    gradu = u.T @ G  # (3, 3): du_i/dX_j
    Fdef = jnp.eye(3, dtype=dtype) + gradu
    Pstress = material.first_piola(Fdef)
    # f_a[i] = P[i, j] G[a, j] * detJ * sum(w)
    return (G @ Pstress.T).reshape(-1) * detJ * weights.sum()
