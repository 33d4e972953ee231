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


# ---------------------------------------------------------------------------
# Online (production) variant: compensated double-word state + per-step
# prediction overwrite + full-rate state recording, band in VMEM.
# ---------------------------------------------------------------------------


def online_scan_vmem_bytes(nc, Bk, DLB, S3p, Tc, save_every,
                           itemsize) -> int:
    """Per-grid-program resident set of the online kernel: one part's
    band blocks, the one-hot shared-slot scatter/gather scratch, the
    COMPACT pred rows in + shared rows out for the sub-chunk, the
    save_every-strided recorded states, the step-tile pred/state
    scratch (<= 2 * 256 * DLB), and ~16 coefficient vectors."""
    return itemsize * (
        2 * nc * Bk * Bk            # band
        + S3p * DLB                 # one-hot scratch
        + 2 * Tc * S3p              # compact preds in + shared out
        + (Tc // max(save_every, 1) + 1) * DLB  # strided traj out
        + 2 * 256 * DLB             # tile pred/state scratch
        + 16 * DLB + 8 * DLB        # vectors + csel
    )


def _pick_step_tile(tc: int, cap: int = 256) -> int:
    """Largest multiple of 8 <= cap dividing tc (1 if none): the step-tile
    length over which the one-hot shared-slot selects are batched into
    real MXU matmuls. Multiples of 8 keep the dynamic sublane slices of
    the pred/shared buffers aligned."""
    best = 1
    for cand in range(8, min(cap, tc) + 1, 8):
        if tc % cand == 0:
            best = cand
    return best


def _online_kernel(
    scal_ref,    # SMEM (8,): t0, dt, alpha, ramped, c1, c2, i0, unused
    Kd_ref,      # VMEM (1, nc, Bk, Bk)
    Kl_ref,      # VMEM (1, nc, Bk, Bk)
    hi_ref,      # VMEM (1, 1, DLB) compensated hi word
    lo_ref,      # VMEM (1, 1, DLB) compensated lo word
    v_ref,       # VMEM (1, 1, DLB) last applied increment
    Fp_ref,      # VMEM (1, 1, DLB)
    lM_ref,      # VMEM (1, 1, DLB)
    bc_ref,      # VMEM (1, 1, DLB)
    mc_ref,      # VMEM (1, 1, DLB) 1 on this part's valid shared slots
    csel_ref,    # VMEM (1, 8, DLB) rows 0-2: dof_mask * [j%3 == c]
    sld_ref,     # VMEM (1, S3p, 1) int32 shared local DOF ids (pad DL-1)
    sm_ref,      # VMEM (1, S3p, 1) 1.0 on real shared slots
    preds_ref,   # VMEM (1, Tc, S3p) COMPACT pred rows
    hi_out,      # VMEM (1, 1, DLB)
    lo_out,      # VMEM (1, 1, DLB)
    v_out,       # VMEM (1, 1, DLB)
    shared_out,  # VMEM (1, Tc, S3p) gathered shared rows of every step
    traj_out,    # VMEM (1, Ttr, DLB) d1 (hi) of every save_every-th step
    sc_ref,      # VMEM scratch (S3p, DLB): one-hot shared-slot selector
    pd_ref,      # VMEM scratch (t_tile, DLB): tile's dense pred rows
    hist_ref,    # VMEM scratch (t_tile, DLB): tile's post-update states
    *,
    num_steps: int,
    nc: int,
    Bk: int,
    save_every: int,
    t_tile: int,
):
    """Mirrors the compensated branch of ShardedProblem.stacked_run
    (parallel/sharded.py: incremental update + TwoSum state roll +
    translation-mean matvec centering + per-step shared-DOF overwrite,
    reference semantics Online_predictor.py:298) with the band pinned in
    VMEM. Shared-slot scatter (pred rows -> dense) and gather (state ->
    shared rows) are exact one-hot MXU matmuls against a selector built
    ONCE per part into VMEM scratch from the sld indices — pred/record
    I/O is O(S3p) per step instead of O(DLB), which is what lets a whole
    3000-step block run as a single kernel call.

    The selects are BATCHED over step tiles of ``t_tile`` (a divisor of
    ``num_steps``): per tile, ONE (t_tile, S3p) @ (S3p, DLB) matmul
    pre-scatters the pred rows and one (t_tile, DLB) x (S3p, DLB)^T
    matmul gathers the tile's shared rows from the recorded states — the
    per-step (1, S3p)-row matvecs filled a single MXU row and cost ~2.6x
    the band matvec itself (measured 293 vs 1048 steps/s at 384^3/256);
    batching restores full-array utilization at identical arithmetic
    (each output row is the same exact one-hot product)."""
    t0 = scal_ref[0]
    dt = scal_ref[1]
    ramped = scal_ref[3]
    c1 = scal_ref[4]
    c2 = scal_ref[5]
    i0 = scal_ref[6]
    Fp = Fp_ref[0, 0, :]
    lM = lM_ref[0, 0, :]
    bc = bc_ref[0, 0, :]
    mc = mc_ref[0, 0, :]
    csel = csel_ref[0]                       # (8, DLB)
    counts = jnp.maximum(
        jnp.sum(csel, axis=1, keepdims=True), 1.0
    )                                        # (8, 1)
    one = jnp.asarray(1.0, Fp.dtype)
    dn_t = (((1,), (1,)), ((), ()))
    # Mosaic requires rank-2 dot operands: contract (8, DLB)x(1, DLB)
    # -> (8, 1) for the component sums, (8, 1)x(8, DLB) -> (1, DLB)
    # for the tiled reconstruction
    sum_t = (((1,), (1,)), ((), ()))
    rec_t = (((0,), (0,)), ((), ()))
    gat_t = (((1,), (1,)), ((), ()))  # (1, DLB)x(S3p, DLB) -> (1, S3p)

    # one-hot selector: row j is e_{sld[j]} * smask[j] (exact scatter
    # AND gather: each column/row has at most one nonzero, so the
    # HIGHEST-precision matmul is value * 1.0 summed with zeros)
    S3p, DLB = sc_ref.shape
    sld_col = sld_ref[0]                     # (S3p, 1) int32
    sm_col = sm_ref[0]                       # (S3p, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (S3p, DLB), 1)
    sc_ref[:, :] = (
        (lane == sld_col).astype(Fp.dtype) * sm_col
    )

    def band_matvec(x):  # (DLB,) -> (DLB,)
        xr = x[None, :]
        chunks = []
        for c in range(nc):
            x_c = xr[:, c * Bk : (c + 1) * Bk]
            y = jnp.dot(
                x_c, Kd_ref[0, c],
                preferred_element_type=x.dtype, precision=HIGHEST,
            )
            if c > 0:
                x_m = xr[:, (c - 1) * Bk : c * Bk]
                y = y + jax.lax.dot_general(
                    x_m, Kl_ref[0, c], dn_t,
                    preferred_element_type=x.dtype, precision=HIGHEST,
                )
            if c + 1 < nc:
                x_p = xr[:, (c + 1) * Bk : (c + 2) * Bk]
                y = y + jnp.dot(
                    x_p, Kl_ref[0, c + 1],
                    preferred_element_type=x.dtype, precision=HIGHEST,
                )
            chunks.append(y)
        return jnp.concatenate(chunks, axis=1)[0]

    scat_t = (((1,), (0,)), ((), ()))  # (T, S3p)x(S3p, DLB) -> (T, DLB)

    def tile_body(t, carry):
        base = t * t_tile
        # pre-scatter the tile's compact pred rows to dense layout in
        # one MXU matmul (exact: one-hot columns)
        pd_ref[:, :] = jax.lax.dot_general(
            preds_ref[0, pl.dslice(base, t_tile), :], sc_ref[:, :],
            scat_t, preferred_element_type=Fp.dtype, precision=HIGHEST,
        )

        def body(j, carry):
            hi, lo, v = carry
            ig = base + j
            # translation-mean centering (sharded._translation_mean):
            # the one-hot csel rows make both the component sums and the
            # tiled reconstruction exact
            sums = jax.lax.dot_general(
                csel, hi[None, :], sum_t,
                preferred_element_type=hi.dtype, precision=HIGHEST,
            )                                    # (8, 1)
            mean = sums / counts
            tbar = jax.lax.dot_general(
                mean, csel, rec_t,
                preferred_element_type=hi.dtype, precision=HIGHEST,
            )[0]                                 # (DLB,)
            f_int = band_matvec(hi - tbar)
            tn = t0 + dt * (i0 + ig.astype(hi.dtype))
            ramp = jnp.where(ramped > 0.5, jnp.minimum(tn, one), one)
            delta = (c1 * v + c2 * ((Fp * ramp - f_int) / lM)) * bc
            # prediction overwrite in incremental form: at valid shared
            # slots the increment becomes pred - (hi + lo)
            pred = pd_ref[j, :]                  # (DLB,)
            delta = delta * (one - mc) + (pred - (hi + lo)) * mc
            # TwoSum(hi, delta) + renormalize (Knuth/Dekker EFTs) —
            # identical op order to the scan path
            s = hi + delta
            z = s - hi
            e = (hi - (s - z)) + (delta - z)
            lo = lo + e
            hi2 = s + lo
            lo2 = lo - (hi2 - s)
            hist_ref[j, :] = hi2

            @pl.when(ig % save_every == 0)
            def _record():
                traj_out[0, ig // save_every, :] = hi2

            return (hi2, lo2, delta)

        carry = jax.lax.fori_loop(0, t_tile, body, carry)
        # batched shared-row gather of the tile's recorded states
        shared_out[0, pl.dslice(base, t_tile), :] = jax.lax.dot_general(
            hist_ref[:, :], sc_ref[:, :], gat_t,
            preferred_element_type=Fp.dtype, precision=HIGHEST,
        )
        return carry

    hi, lo, v = jax.lax.fori_loop(
        0, num_steps // t_tile, tile_body,
        (hi_ref[0, 0, :], lo_ref[0, 0, :], v_ref[0, 0, :]),
    )
    hi_out[0, 0, :] = hi
    lo_out[0, 0, :] = lo
    v_out[0, 0, :] = v


def pallas_online_chunk(
    Kd, Kl, hi, lo, v, Fp, lM, bc, mc, csel, sld3, sm3, preds_c,
    *, t0_i0, dt, alpha, ramped, save_every,
):
    """One sub-chunk of ``Tc`` online steps for all parts (grid over the
    part axis). ``preds_c`` is (P, Tc, S3p) COMPACT shared rows;
    ``sld3``/``sm3`` are (P, S3p, 1) selector inputs. Returns
    (hi, lo, v, shared (P, Tc, S3p), traj (P, Tc//save_every, DLB))."""
    import numpy as np

    P, nc, Bk, _ = Kd.shape
    DLB = nc * Bk
    Tc = preds_c.shape[1]
    S3p = preds_c.shape[2]
    Ttr = Tc // save_every
    t_tile = _pick_step_tile(Tc)
    dtype = hi.dtype
    beta = 0.5 * float(alpha) * float(dt)
    scal = jnp.asarray(
        [t0_i0[0], dt, alpha, 1.0 if ramped else 0.0,
         (1.0 - beta) / (1.0 + beta), float(dt) ** 2 / (1.0 + beta),
         t0_i0[1], 0.0],
        dtype,
    )
    kern = functools.partial(
        _online_kernel, num_steps=Tc, nc=nc, Bk=Bk,
        save_every=save_every, t_tile=t_tile,
    )
    band = pl.BlockSpec((1, nc, Bk, Bk), lambda p: (p, 0, 0, 0))
    vec = lambda: pl.BlockSpec((1, 1, DLB), lambda p: (p, 0, 0))
    mat8 = pl.BlockSpec((1, 8, DLB), lambda p: (p, 0, 0))
    col = lambda: pl.BlockSpec((1, S3p, 1), lambda p: (p, 0, 0))
    smat = lambda: pl.BlockSpec((1, Tc, S3p), lambda p: (p, 0, 0))
    trmat = pl.BlockSpec((1, Ttr, DLB), lambda p: (p, 0, 0))
    itemsize = np.dtype(dtype).itemsize
    hi2, lo2, v2, shared, traj = pl.pallas_call(
        kern,
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [band, band] + [vec() for _ in range(7)]
        + [mat8, col(), col(), smat()],
        out_specs=(vec(), vec(), vec(), smat(), trmat),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1, DLB), dtype),
            jax.ShapeDtypeStruct((P, 1, DLB), dtype),
            jax.ShapeDtypeStruct((P, 1, DLB), dtype),
            jax.ShapeDtypeStruct((P, Tc, S3p), dtype),
            jax.ShapeDtypeStruct((P, Ttr, DLB), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((S3p, DLB), dtype),
            pltpu.VMEM((t_tile, DLB), dtype),
            pltpu.VMEM((t_tile, DLB), dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * P * Tc * (
                (3 * nc - 2) * Bk * Bk + 2 * S3p * DLB
                + 16 * DLB + 2 * 8 * DLB
            ),
            bytes_accessed=itemsize * P * (
                2 * nc * Bk * Bk + 2 * Tc * S3p
                + Ttr * DLB + 12 * DLB
            ),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 2**20,
        ),
        interpret=_interpret(),
    )(scal, Kd, Kl, hi, lo, v, Fp, lM, bc, mc, csel, sld3, sm3, preds_c)
    return hi2, lo2, v2, shared, traj
