"""P1/P2 tetrahedral shape functions and parametric derivatives.

Same basis as the reference (Tools/Shape_function_Deriv.py:9-47), written as
jnp expressions so they trace cleanly under vmap/jit. The Jacobian convention
matches Shape_function_Deriv.py:60-67: J[i, j] = sum_a dN_a/dxi_j * x_a[i],
i.e. J = P^T @ dN for nodal coordinates P (nb, 3).
"""

from __future__ import annotations

import jax.numpy as jnp


def shape_function(deg: int, xi):
    """Basis values at parametric point xi (3,). Returns (nb,)."""
    x, y, z = xi[0], xi[1], xi[2]
    if deg == 1:
        return jnp.stack([1.0 - x - y - z, x, y, z])
    if deg == 2:
        w = 1.0 - x - y - z
        return jnp.stack(
            [
                w * (2.0 * w - 1.0),
                x * (2.0 * x - 1.0),
                y * (2.0 * y - 1.0),
                z * (2.0 * z - 1.0),
                4.0 * x * w,
                4.0 * x * y,
                4.0 * y * w,
                4.0 * z * w,
                4.0 * x * z,
                4.0 * y * z,
            ]
        )
    raise ValueError(f"unsupported polynomial degree {deg}")


def shape_derivative(deg: int, xi):
    """Parametric gradients dN/dxi at xi. Returns (nb, 3)."""
    x, y, z = xi[0], xi[1], xi[2]
    if deg == 1:
        return jnp.array(
            [
                [-1.0, -1.0, -1.0],
                [1.0, 0.0, 0.0],
                [0.0, 1.0, 0.0],
                [0.0, 0.0, 1.0],
            ],
            dtype=xi.dtype,
        )
    if deg == 2:
        g = -3.0 + 4.0 * (x + y + z)
        zero = jnp.zeros_like(x)
        rows = [
            [g, g, g],
            [4.0 * x - 1.0, zero, zero],
            [zero, 4.0 * y - 1.0, zero],
            [zero, zero, 4.0 * z - 1.0],
            [4.0 - 8.0 * x - 4.0 * y - 4.0 * z, -4.0 * x, -4.0 * x],
            [4.0 * y, 4.0 * x, zero],
            [-4.0 * y, 4.0 - 4.0 * x - 8.0 * y - 4.0 * z, -4.0 * y],
            [-4.0 * z, -4.0 * z, 4.0 - 4.0 * x - 4.0 * y - 8.0 * z],
            [4.0 * z, zero, 4.0 * x],
            [zero, 4.0 * z, 4.0 * y],
        ]
        return jnp.stack([jnp.stack(r) for r in rows])
    raise ValueError(f"unsupported polynomial degree {deg}")


def n_basis(deg: int) -> int:
    return {1: 4, 2: 10}[deg]


def jacobian(P, dN):
    """Isoparametric Jacobian, J = P^T @ dN (3, 3)."""
    return P.T @ dN


def isoparametric_map(P, N):
    """Physical coordinate of a parametric point: X_i = sum_a P[a,i] N_a."""
    return P.T @ N
