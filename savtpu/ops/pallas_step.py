"""Pallas TPU kernel: fused explicit-step for the dense local-K path.

One time step of the central-difference update reads the (DL, DL) local
stiffness once and the five state/coefficient vectors, and writes d1 —
i.e. it is HBM-bound on K. XLA already fuses the elementwise update into
the matmul epilogue; this kernel makes the fusion explicit and removes the
remaining intermediate traffic: each grid row computes a (TILE, DL) @
(DL, 1) MXU matvec tile and applies the full update formula
(Dynamic_solver.py:17) + Dirichlet mask in-register before the single
store of its d1 tile.

Requires DL % TILE == 0 (ShardedProblem pads local DOF counts to the tile
multiple when fint_mode='pallas').
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _step_kernel(scal_ref, K_ref, d0_ref, dn_ref, Fp_ref, lM_ref, bc_ref,
                 d1_ref):
    """Grid row i: d1[i*T:(i+1)*T] = update(K[i*T:(i+1)*T, :] @ d0, ...)."""
    ramp = scal_ref[0]
    dt = scal_ref[1]
    alpha = scal_ref[2]
    i = pl.program_id(0)
    # MXU matvec tile: (TILE, DL) @ (DL, 1)
    f_int = jnp.dot(
        K_ref[:, :], d0_ref[:, :].T, preferred_element_type=jnp.float32
    )[:, 0]
    d0 = d0_ref[0, pl.ds(i * TILE, TILE)]  # own tile for the update
    dn = dn_ref[0, :]
    f_ext = Fp_ref[0, :] * ramp
    lM = lM_ref[0, :]
    num = (
        dt * dt * (f_ext - f_int)
        + 2.0 * lM * d0
        - lM * dn
        + 0.5 * dt * alpha * lM * dn
    )
    d1_ref[0, :] = num / (lM + 0.5 * alpha * dt * lM) * bc_ref[0, :]


@functools.partial(jax.jit, static_argnames=("dt", "alpha"))
def fused_dense_step(K, d0, dn, F_pre, lM, bc, ramp, dt: float, alpha: float):
    """One fused explicit step. K (DL, DL); vectors (DL,); ramp scalar.

    Note the tile's vector slices: row i needs d0 fully (matvec) but only
    its own TILE slice of dn/F_pre/lM/bc and writes its own d1 slice."""
    DL = K.shape[0]
    assert DL % TILE == 0, f"DL={DL} not a multiple of {TILE}"
    grid = (DL // TILE,)
    scal = jnp.stack(
        [ramp.astype(jnp.float32), jnp.float32(dt), jnp.float32(alpha)]
    )

    out = pl.pallas_call(
        _step_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # scalars
            pl.BlockSpec((TILE, DL), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),              # K row tile
            pl.BlockSpec((1, DL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),              # d0 (full)
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # dn tile
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # F_pre tile
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # lM tile
            pl.BlockSpec((1, TILE), lambda i: (0, i),
                         memory_space=pltpu.VMEM),              # bc tile
        ],
        out_specs=pl.BlockSpec((1, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, DL), d0.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * DL * DL + 10 * DL,
            bytes_accessed=4 * (DL * DL + 6 * DL),
            transcendentals=0,
        ),
    )(
        scal,
        K,
        d0.reshape(1, DL),
        dn.reshape(1, DL),
        F_pre.reshape(1, DL),
        lM.reshape(1, DL),
        bc.reshape(1, DL),
    )
    return out[0]
