"""Pallas TPU kernels for the explicit stepper's dense local-K path.

Two kernels, both replacing the hot op of the reference stepper — the
per-rank stiffness matvec F_int = K_local @ d (Tools/Dynamic_solver.py:12):

``batched_fint_matvec``
    One step's matvec for all parts: grid (P, DL/TILE), each program
    computes one (1, DL) @ (DL, TILE) MXU tile. Uses K's symmetry to keep
    everything in row layout (K @ d == (d_row @ K)^T; column-vector forms
    force sublane<->lane relayouts). Drop-in ``_fint_stacked`` branch
    (``fint_mode='pallas'``) for both the exchanged and comm-free paths.

``pallas_scan_comm_free``
    The whole comm-free scan in ONE kernel program: every part's K is
    DMA'd HBM->VMEM once and stays VMEM-resident across all T time steps
    of the inner fori_loop. The lax.scan dense path re-reads the (P, DL,
    DL) stiffness from HBM every step — HBM-bandwidth-bound at ~1% MXU
    utilization (docs/STATUS_r1.md); pinning K removes that traffic
    entirely. Parts are statically unrolled inside each step (their
    matvecs are independent, so the MXU pipelines them; only the
    step-to-step dependence is serial). Supports the sync-avoiding NN
    overwrite (Online_predictor.py:294-301) via one-hot gather/scatter
    matmuls (arbitrary-index gathers don't vectorize on TPU; S3xDL
    one-hot matmuls ride the MXU instead) and full-resolution
    shared-trace recording.

On non-TPU backends both kernels run in interpreter mode so the
correctness tests execute everywhere; compiled-on-TPU numbers come from
benchmarks/sweep.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import HIGHEST

TILE = 128  # column tile of the matvec; DL is padded to a multiple of this


def pad_dl(dl: int) -> int:
    """Padded local DOF count for the pallas kernels."""
    return -(-dl // TILE) * TILE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ----------------------------------------------------------------------
# per-step batched matvec (fint_mode='pallas')
# ----------------------------------------------------------------------

def _matvec_kernel(K_ref, d_ref, out_ref):
    # row-layout matvec via symmetry: out = d_row @ K[:, tile]
    out_ref[0, 0, :] = jnp.dot(
        d_ref[0], K_ref[0], preferred_element_type=d_ref.dtype,
        precision=HIGHEST,
    )[0]


def batched_fint_matvec(K, d):
    """(P, DL, DL) @ (P, DL) -> (P, DL) for symmetric K; DL % TILE == 0."""
    P, DL, _ = K.shape
    assert DL % TILE == 0, f"DL={DL} not a multiple of {TILE}"
    out = pl.pallas_call(
        _matvec_kernel,
        grid=(P, DL // TILE),
        in_specs=[
            pl.BlockSpec((1, DL, TILE), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, DL), lambda p, i: (p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, TILE), lambda p, i: (p, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, 1, DL), d.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * DL * DL,
            bytes_accessed=K.dtype.itemsize * P * (DL * DL + 2 * DL),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(K, d.reshape(P, 1, DL))
    return out[:, 0, :]


# ----------------------------------------------------------------------
# whole-scan kernel: every part's K VMEM-resident across every time step
# ----------------------------------------------------------------------

def _scan_kernel(
    scal_ref,       # SMEM (4,): t0, dt, alpha, ramped
    K_ref,          # VMEM (P, DL, DL)     all parts' stiffness (resident)
    d0_ref,         # VMEM (P, DL)
    dn_ref,         # VMEM (P, DL)
    Fp_ref,         # VMEM (P, DL)
    lM_ref,         # VMEM (P, DL)
    bc_ref,         # VMEM (P, DL)
    G_ref,          # VMEM (P, S3, DL)     one-hot shared-DOF selectors
    preds_ref,      # VMEM (P, T, S3)      NN shared-DOF rows (or zeros)
    d0_out,         # VMEM (P, DL)
    dn_out,         # VMEM (P, DL)
    shared_out,     # VMEM (P, T, S3)      per-step shared trace
    *,
    num_steps: int,
    n_parts: int,
    use_preds: bool,
    record_shared: bool,
):
    t0 = scal_ref[0]
    dt = scal_ref[1]
    alpha = scal_ref[2]
    ramped = scal_ref[3]
    Fp = Fp_ref[:, :]
    lM = lM_ref[:, :]
    bc = bc_ref[:, :]
    # scatter mask: 1 on DOFs owned by a real shared slot
    sm = jnp.sum(G_ref[:, :, :], axis=1)          # (P, DL)
    denom = lM + 0.5 * alpha * dt * lM

    def body(i, carry):
        d0, dn = carry                            # (P, DL) row layouts
        # per-part row matvec via K symmetry; parts unrolled statically —
        # independent matmuls the MXU pipelines within the step
        f_int = jnp.concatenate(
            [
                jnp.dot(d0[p : p + 1, :], K_ref[p],
                        preferred_element_type=d0.dtype,
                        precision=HIGHEST)
                for p in range(n_parts)
            ],
            axis=0,
        )
        tn = t0 + i.astype(d0.dtype) * dt
        ramp = jnp.where(ramped > 0.5, jnp.minimum(tn, 1.0),
                         jnp.asarray(1.0, d0.dtype))
        d1 = (
            dt * dt * (Fp * ramp - f_int)
            + 2.0 * lM * d0
            - lM * dn
            + 0.5 * dt * alpha * lM * dn
        ) / denom
        d1 = d1 * bc
        if use_preds:
            pred_sc = jnp.concatenate(
                [
                    jnp.dot(preds_ref[p, i, :][None, :], G_ref[p],
                            preferred_element_type=d1.dtype,
                            precision=HIGHEST)
                    for p in range(n_parts)
                ],
                axis=0,
            )                                      # (P, DL)
            d1 = d1 * (1.0 - sm) + pred_sc
        if record_shared:
            for p in range(n_parts):
                # row = d1[p] @ G[p]^T, via symmetry-free explicit dot
                shared_out[p, i, :] = jnp.dot(
                    G_ref[p], d1[p, :][:, None],
                    preferred_element_type=d1.dtype, precision=HIGHEST,
                )[:, 0]
        return (d1, d0)

    d0, dn = jax.lax.fori_loop(
        0, num_steps, body, (d0_ref[:, :], dn_ref[:, :])
    )
    d0_out[:, :] = d0
    dn_out[:, :] = dn


@functools.partial(
    jax.jit,
    static_argnames=("num_steps", "dt", "alpha", "ramped", "record_shared"),
)
def pallas_scan_comm_free(
    K,            # (P, DL, DL)
    d0,           # (P, DL)
    dn,           # (P, DL)
    t0,           # scalar
    F_pre,        # (P, DL)
    lM,           # (P, DL)
    bc,           # (P, DL)
    G,            # (P, S3, DL) one-hot shared selectors (0 rows on pads)
    preds,        # (P, T, S3) or None
    *,
    num_steps: int,
    dt: float,
    alpha: float,
    ramped: bool,
    record_shared: bool,
):
    """Run ``num_steps`` comm-free explicit steps for every part with K
    pinned in VMEM. Returns (d0, dn, t_final, shared_trace)."""
    P, DL, _ = K.shape
    S3 = G.shape[1]
    assert DL % TILE == 0
    dtype = d0.dtype
    use_preds = preds is not None
    if preds is None:
        preds = jnp.zeros((P, 1, S3), dtype=dtype)
    T_pred = preds.shape[1]
    T_rec = num_steps if record_shared else 1

    scal = jnp.asarray(
        [t0, dt, alpha, 1.0 if ramped else 0.0], dtype=dtype
    )
    kern = functools.partial(
        _scan_kernel,
        num_steps=num_steps,
        n_parts=P,
        use_preds=use_preds,
        record_shared=record_shared,
    )
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    d0f, dnf, shared = pl.pallas_call(
        kern,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            full(), full(), full(), full(), full(), full(), full(), full(),
        ],
        out_specs=(full(), full(), full()),
        out_shape=(
            jax.ShapeDtypeStruct((P, DL), dtype),
            jax.ShapeDtypeStruct((P, DL), dtype),
            jax.ShapeDtypeStruct((P, T_rec, S3), dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * P * num_steps * DL * DL,
            bytes_accessed=K.dtype.itemsize * P * (DL * DL + 6 * DL),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the resident set (all parts' K + traces) intentionally
            # exceeds Mosaic's default 16 MiB scoped-vmem budget; v5e has
            # 128 MiB physical VMEM
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=_interpret(),
    )(scal, K, d0, dn, F_pre, lM, bc, G, preds)
    t_final = jnp.asarray(t0, dtype) + num_steps * jnp.asarray(dt, dtype)
    out_shared = shared if record_shared else None
    return d0f, dnf, t_final, out_shared


def scan_vmem_bytes(P, DL, S3, T_pred, T_rec, itemsize) -> int:
    """VMEM footprint estimate of pallas_scan_comm_free's resident set."""
    return itemsize * (
        P * DL * DL            # K
        + P * S3 * DL          # one-hot selectors
        + P * (T_pred + T_rec) * S3
        + 8 * P * DL           # state/coefficient vectors + temps
    )
