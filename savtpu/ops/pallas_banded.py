"""Banded (block-tridiagonal) VMEM-resident whole-scan Pallas kernel.

The 96x8x8/8-part sweep row is the throughput sore spot (VERDICT r2 #6):
DL=3160 puts the dense whole-scan kernel past VMEM (P*DL^2*4 = 320 MB)
and the lax.scan banded path re-streams the band (2*nc*Bk^2 per part,
~54 MB total) from HBM every one of 1e5 steps — memory-latency-bound at
~4.8k steps/s. But the *band* fits VMEM comfortably where dense K cannot:
RCM ordering gives Bk=256 chunks, so Kd+Kl is ~6.8 MB/part. This kernel
pins the whole band for all parts in VMEM across every time step of a
single fori_loop program, exactly like ops/pallas_step.pallas_scan_comm_free
does for dense K (reference hot loop: Tools/Dynamic_solver.py:9-34; the
banded storage layout is _build_banded in parallel/sharded.py).

Per step, per part, per chunk c (super-diagonal from symmetry):

    y_c = x_c @ Kd_c  +  x_{c-1} . Kl_c^T  +  x_{c+1} @ Kl_{c+1}

all in row layout (no relayouts); the x_{c-1} term contracts Kl's second
axis via dot_general instead of materializing a transpose.

Scope: comm-free stepping without NN-overwrite or trace recording — the
sync-avoiding benchmark mode (record='none'). The dense kernel keeps the
preds/record duties at sizes where it fits.

Parts are INDEPENDENT in comm-free mode, so the kernel grids over the
part axis: each grid program time-steps one part with only that part's
band resident (2*nc*Bk^2*itemsize — 14.8 MB at 96x8x8/8), instead of
pinning all P parts at once (118 MB, which busted the VMEM budget and
silently fell back to the HBM-streaming lax.scan path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def banded_scan_vmem_bytes(P, nc, Bk, itemsize) -> int:
    """Per-grid-program resident set: ONE part's band blocks +
    state/coefficient vectors (the kernel grids over parts)."""
    del P
    return itemsize * (2 * nc * Bk * Bk + 10 * nc * Bk)


def _kernel(
    scal_ref,   # SMEM (4,): t0, dt, alpha, ramped
    Kd_ref,     # VMEM (1, nc, Bk, Bk) this part's diagonal blocks
    Kl_ref,     # VMEM (1, nc, Bk, Bk) this part's sub-diagonal blocks
    d0_ref,     # VMEM (1, 1, DLB)  (the unit axis satisfies the TPU
    dn_ref,     # VMEM (1, 1, DLB)   block-shape tiling rule: last two
    Fp_ref,     # VMEM (1, 1, DLB)   block dims must divide (8, 128) or
    lM_ref,     # VMEM (1, 1, DLB)   equal the array dims)
    bc_ref,     # VMEM (1, 1, DLB)
    d0_out,     # VMEM (1, 1, DLB)
    dn_out,     # VMEM (1, 1, DLB)
    *,
    num_steps: int,
    n_parts: int,
    nc: int,
    Bk: int,
):
    t0 = scal_ref[0]
    dt = scal_ref[1]
    alpha = scal_ref[2]
    ramped = scal_ref[3]
    Fp = Fp_ref[:, 0, :]
    lM = lM_ref[:, 0, :]
    bc = bc_ref[:, 0, :]
    denom = lM + 0.5 * alpha * dt * lM
    # contract x (1, Bk) with Kl's SECOND axis: x . Kl^T without relayout
    dn_t = (((1,), (1,)), ((), ()))

    def body(i, carry):
        d0, dn = carry                              # (P, DLB)
        rows = []
        for p in range(n_parts):
            chunks = []
            for c in range(nc):
                x_c = d0[p, c * Bk : (c + 1) * Bk][None, :]
                y = jnp.dot(
                    x_c, Kd_ref[p, c],
                    preferred_element_type=d0.dtype, precision=HIGHEST,
                )
                if c > 0:
                    x_m = d0[p, (c - 1) * Bk : c * Bk][None, :]
                    y = y + jax.lax.dot_general(
                        x_m, Kl_ref[p, c], dn_t,
                        preferred_element_type=d0.dtype,
                        precision=HIGHEST,
                    )
                if c + 1 < nc:
                    x_p = d0[p, (c + 1) * Bk : (c + 2) * Bk][None, :]
                    y = y + jnp.dot(
                        x_p, Kl_ref[p, c + 1],
                        preferred_element_type=d0.dtype,
                        precision=HIGHEST,
                    )
                chunks.append(y)
            rows.append(jnp.concatenate(chunks, axis=1))
        f_int = jnp.concatenate(rows, axis=0)       # (P, DLB)
        tn = t0 + i.astype(d0.dtype) * dt
        ramp = jnp.where(ramped > 0.5, jnp.minimum(tn, 1.0),
                         jnp.asarray(1.0, d0.dtype))
        d1 = (
            dt * dt * (Fp * ramp - f_int)
            + 2.0 * lM * d0
            - lM * dn
            + 0.5 * dt * alpha * lM * dn
        ) / denom
        return (d1 * bc, d0)

    d0, dn = jax.lax.fori_loop(
        0, num_steps, body, (d0_ref[:, 0, :], dn_ref[:, 0, :])
    )
    d0_out[:, 0, :] = d0
    dn_out[:, 0, :] = dn


@functools.partial(
    jax.jit, static_argnames=("num_steps", "dt", "alpha", "ramped")
)
def pallas_scan_comm_free_banded(
    Kd,           # (P, nc, Bk, Bk)
    Kl,           # (P, nc, Bk, Bk)
    d0,           # (P, DL)  solver layout (dummy slot at DL-1)
    dn,           # (P, DL)
    t0,           # scalar
    F_pre,        # (P, DL)
    lM,           # (P, DL)
    bc,           # (P, DL)
    *,
    num_steps: int,
    dt: float,
    alpha: float,
    ramped: bool,
):
    """num_steps comm-free steps with the band pinned in VMEM.
    Returns (d0, dn, t_final) in the solver's (P, DL) layout."""
    P, nc, Bk, _ = Kd.shape
    DLB = nc * Bk
    DL = d0.shape[1]
    n = min(DL - 1, DLB)  # real DOF span; slot DL-1 is the dummy
    dtype = d0.dtype

    def fit(v, fill):
        out = jnp.full((P, DLB), fill, dtype)
        return out.at[:, :n].set(v[:, :n].astype(dtype))[:, None, :]

    scal = jnp.asarray([t0, dt, alpha, 1.0 if ramped else 0.0], dtype)
    kern = functools.partial(
        _kernel, num_steps=num_steps, n_parts=1, nc=nc, Bk=Bk
    )
    band = pl.BlockSpec((1, nc, Bk, Bk), lambda p: (p, 0, 0, 0))
    vec = lambda: pl.BlockSpec((1, 1, DLB), lambda p: (p, 0, 0))
    d0f, dnf = pl.pallas_call(
        kern,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [band, band] + [vec() for _ in range(5)],
        out_specs=(vec(), vec()),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1, DLB), dtype),
            jax.ShapeDtypeStruct((P, 1, DLB), dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * num_steps * (3 * nc - 2) * Bk * Bk,
            bytes_accessed=Kd.dtype.itemsize * P
            * (2 * nc * Bk * Bk + 6 * DLB),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_interpret(),
    )(
        scal, Kd, Kl,
        fit(d0, 0.0), fit(dn, 0.0), fit(F_pre, 0.0),
        fit(lM, 1.0), fit(bc, 0.0),
    )

    def unfit(v):
        out = jnp.zeros((P, DL), dtype)
        return out.at[:, :n].set(v[:, 0, :n])

    t_final = jnp.asarray(t0, dtype) + num_steps * jnp.asarray(dt, dtype)
    return unfit(d0f), unfit(dnf), t_final
