"""Nonlinear (Neo-Hookean) matrix-free internal forces.

The stretch-goal material path (BASELINE.md configs): instead of a
pre-assembled stiffness, the internal force is recomputed from the current
displacement every step — per-element deformation gradient, first
Piola-Kirchhoff stress, nodal forces — vmapped over elements and
scatter-added with segment_sum. Drops into ``make_step_fn`` in place of
the linear FIntOperator (the central-difference update is unchanged).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.element import neo_hookean_element_fint
from ..ops.material import NeoHookean


class NeoHookeanFIntOperator:
    def __init__(self, material: NeoHookean, coords, edofs, ndof: int):
        self.material = material
        self.coords = jnp.asarray(coords)      # (E, 4, 3)
        self.edofs = jnp.asarray(edofs)        # (E, 12)
        self.ndof = int(ndof)
        mat = material
        self._fe = jax.vmap(
            lambda P, de: neo_hookean_element_fint(mat, P, de)
        )

    def __call__(self, d):
        d = d.reshape(-1)
        d_e = d[self.edofs]                    # (E, 12)
        fe = self._fe(self.coords, d_e)        # (E, 12)
        return jax.ops.segment_sum(
            fe.reshape(-1), self.edofs.reshape(-1), num_segments=self.ndof
        )
