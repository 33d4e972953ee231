"""Explicit central-difference stepper as a jitted ``lax.scan``.

The math is the displacement-form update of Tools/Dynamic_solver.py:17 with
mass-proportional damping C = alpha*M:

    d1 = (dt^2 (F_ext - F_int) + 2 M d0 - M dn + dt/2 M alpha dn)
         / (M + alpha dt/2 M)                                # elementwise, lumped M
    d1[Dirichlet] = 0

where F_int = K_nobc d0 (here an FIntOperator — dense/EBE/BCOO/Pallas) and
F_ext = F_pre * linear_ramp(t) (Dynamic_solver.py:12-13). The reference
drives this from a Python for-loop with per-step MPI collectives
(Data_prepare.py:223-240); here the whole trajectory is one compiled scan.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from ..ops.material import linear_ramp


def make_step_fn(
    fint: Callable,
    F_pre,
    lumped_M,
    mask,
    alpha: float,
    dt: float,
    ramped: bool = True,
) -> Callable:
    """Pure per-step function (d0, dn, tn) -> d1."""
    lM = lumped_M
    denom = lM + 0.5 * alpha * dt * lM

    def step(d0, dn, tn):
        F_int = fint(d0)
        ramp = linear_ramp(tn) if ramped else jnp.ones((), dtype=d0.dtype)
        F_ext = F_pre * ramp
        d1 = (
            dt * dt * (F_ext - F_int)
            + 2.0 * lM * d0
            - lM * dn
            + 0.5 * dt * alpha * lM * dn
        ) / denom
        return d1 * mask

    return step


def run_explicit(
    step_fn: Callable,
    d0,
    dn,
    t0: float,
    dt: float,
    num_steps: int,
    save_every: int = 1,
    unroll: int = 1,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Scan ``num_steps`` steps from (d0, dn, t0).

    Returns (trajectory (num_steps//save_every, ndof), final carry). The
    trajectory records d1 of steps i with i % save_every == 0 (the first
    step of each save block), matching Data_prepare.py:238-240. t advances
    as tn += dt per step (ramp evaluated at the step's *start* time, like
    Dynamic_solver.py:13 with T.tn)."""
    if num_steps % save_every:
        raise ValueError("num_steps must be divisible by save_every")
    num_blocks = num_steps // save_every
    dtype = d0.dtype
    t0 = jnp.asarray(t0, dtype=dtype)

    if save_every == 1:

        def body(carry, _):
            d0, dn, tn = carry
            d1 = step_fn(d0, dn, tn)
            return (d1, d0, tn + dt), d1

        carry, traj = jax.lax.scan(
            body, (d0, dn, t0), None, length=num_steps, unroll=unroll
        )
        return traj, carry

    def block(carry, _):
        d0, dn, tn = carry
        d_first = step_fn(d0, dn, tn)
        carry = (d_first, d0, tn + dt)

        def inner(_, c):
            d0, dn, tn = c
            d1 = step_fn(d0, dn, tn)
            return (d1, d0, tn + dt)

        carry = jax.lax.fori_loop(0, save_every - 1, inner, carry)
        return carry, d_first

    carry, traj = jax.lax.scan(block, (d0, dn, t0), None, length=num_blocks)
    return traj, carry


def run_explicit_jit(
    step_fn: Callable,
    d0,
    dn,
    t0: float,
    dt: float,
    num_steps: int,
    save_every: int = 1,
):
    """Jitted wrapper (static step count / stride)."""
    fn = jax.jit(
        lambda d0, dn, t0: run_explicit(
            step_fn, d0, dn, t0, dt, num_steps, save_every
        )
    )
    return fn(d0, dn, t0)
