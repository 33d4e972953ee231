"""Material models.

``LinearElastic`` reproduces the reference's ``elasticity`` class
(Tools/commons.py:15-41): Voigt 6x6 stiffness D from Lame parameters and the
volumetric load f(X, t) = (0, -fz, -fz), optionally multiplied by
linear_ramp(t) (commons.py:7-11). A compressible Neo-Hookean model is
included as the stretch-goal material (BASELINE.md configs): it supplies
per-element internal forces for the matrix-free stepper path.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


def linear_ramp(t):
    """min(t, 1): ramp ends at t = 1 s (Tools/commons.py:7-11)."""
    return jnp.minimum(t, 1.0)


@dataclass(frozen=True)
class LinearElastic:
    lmd: float
    mu: float
    rho: float
    fz: float
    ramped: bool = True

    @classmethod
    def from_engineering(cls, E, nu, rho, fz, ramped=True):
        return cls(
            lmd=E * nu / ((1 + nu) * (1 - 2 * nu)),
            mu=E / (2 * (1 + nu)),
            rho=rho,
            fz=fz,
            ramped=ramped,
        )

    def D(self, dtype=jnp.float64):
        """Voigt 6x6 elasticity matrix, ordering (xx, yy, zz, yz, zx, xy)."""
        l, m = self.lmd, self.mu
        D = jnp.array(
            [
                [l + 2 * m, l, l, 0, 0, 0],
                [l, l + 2 * m, l, 0, 0, 0],
                [l, l, l + 2 * m, 0, 0, 0],
                [0, 0, 0, m, 0, 0],
                [0, 0, 0, 0, m, 0],
                [0, 0, 0, 0, 0, m],
            ],
            dtype=dtype,
        )
        return D

    def body_force(self, X, t, dtype=jnp.float64):
        """Volumetric load density at physical point X (3,) and time t."""
        f = jnp.array([0.0, -self.fz, -self.fz], dtype=dtype)
        if self.ramped:
            f = f * linear_ramp(t)
        return f


@dataclass(frozen=True)
class NeoHookean:
    """Compressible Neo-Hookean: W = mu/2 (I1 - 3) - mu ln J + lmd/2 (ln J)^2.

    First Piola stress P = mu (F - F^-T) + lmd ln(J) F^-T. Used by the
    matrix-free nonlinear F_int path (per-step element force recomputation —
    SURVEY.md §7 phase 6 stretch goal)."""

    lmd: float
    mu: float
    rho: float
    fz: float
    ramped: bool = True

    @classmethod
    def from_engineering(cls, E, nu, rho, fz, ramped=True):
        return cls(
            lmd=E * nu / ((1 + nu) * (1 - 2 * nu)),
            mu=E / (2 * (1 + nu)),
            rho=rho,
            fz=fz,
            ramped=ramped,
        )

    def first_piola(self, F):
        """P(F) for deformation gradient F (3,3)."""
        from .element import det3, inv3

        J = det3(F)
        Finv_T = inv3(F, J).T
        return self.mu * (F - Finv_T) + self.lmd * jnp.log(J) * Finv_T

    def body_force(self, X, t, dtype=jnp.float64):
        f = jnp.array([0.0, -self.fz, -self.fz], dtype=dtype)
        if self.ramped:
            f = f * linear_ramp(t)
        return f
