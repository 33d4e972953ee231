"""Roofline / MFU accounting for the explicit-step scan (VERDICT r4 #7).

The reference publishes no machine-efficiency numbers (its hot loop is a
SciPy CSR matvec under mpi4py, Tools/Dynamic_solver.py:9-34); savtpu's
bench historically reported speedups *vs that loop*, which says nothing
about distance from the hardware. This module turns a measured steps/s
into "% of the machine":

* ``step_cost(fn, args, num_steps)`` — flops and HBM bytes per step from
  XLA's own compiled-program cost analysis (exact for the fused scan the
  timing actually ran; no hand model to drift out of date).
* ``bytes_floor_per_step(sp)`` — an analytic lower bound on HBM traffic
  per step from the problem dims alone: the scan carry + coefficient
  arrays that MUST stream from/to HBM every step, plus the per-mode
  operator data (dense K, banded diagonals, ELL slabs, per-element Ke,
  or nothing at all for the baked-geometry stencil paths). Used to
  sanity-check the XLA number and as the fallback where cost analysis is
  unavailable (Pallas custom calls report ~0).
* ``roofline(...)`` — achieved GB/s / GFLOP/s and % of device peaks.

Peaks are the published per-chip numbers (jax-ml.github.io/scaling-book
spec table); the VPU figure is an estimate (lanes x clock x FMA) — the
explicit-FEM scan is elementwise/VPU code with arithmetic intensity of a
few flops/byte, so %HBM is the load-bearing axis and is exact.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

# device_kind substring -> per-chip peaks.
#   hbm_GBps: HBM bandwidth, GB/s
#   mxu_tflops_bf16: MXU peak, bf16, TFLOP/s
#   vpu_tflops_f32: VPU (vector unit) peak estimate, f32 TFLOP/s
_PEAKS = {
    "v6": {"hbm_GBps": 1640.0, "mxu_tflops_bf16": 918.0, "vpu_tflops_f32": 7.9},
    "v5p": {"hbm_GBps": 2765.0, "mxu_tflops_bf16": 459.0, "vpu_tflops_f32": 7.9},
    # v5e reports device_kind "TPU v5 lite" / "TPU v5e"
    "v5": {"hbm_GBps": 819.0, "mxu_tflops_bf16": 197.0, "vpu_tflops_f32": 3.9},
    "v4": {"hbm_GBps": 1228.0, "mxu_tflops_bf16": 275.0, "vpu_tflops_f32": 3.9},
}


def device_peaks(device=None) -> Optional[dict]:
    """Published peaks for the current (or given) accelerator; None on
    hosts we have no table row for (CPU)."""
    import jax

    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower().replace(" ", "")
    for key, row in _PEAKS.items():
        if key in kind:
            return dict(row, device_kind=device.device_kind)
    return None


def _stencil_cell_flops(G6, material: str) -> float:
    """Exact flop count per CELL of the structured-box force kernels, by
    replaying the kernel's loop structure (sharded.py _lin_fint_stencil /
    _nh_fint_stencil) against the baked per-type gradients G6 (6,4,3):
    the kernels prune exactly-zero gradient entries at trace time, so the
    count must too. `log` and `div` are counted as one flop each (they
    are several VPU ops in truth — the model under- rather than
    over-claims). Curvilinear grids (G per cell) skip no zeros; pass the
    dense per-type G there."""
    G6 = np.asarray(G6)
    total = 0
    for t in range(6):
        G = G6[t] if G6.ndim == 3 else G6  # (4, 3)
        nz = [[a for a in range(4) if G[a, j] != 0.0] for j in range(3)]
        # gradient build H/F_ij = sum_a u[a,i] G[a,j] : 3 rows i per j
        grad = sum(3 * (2 * len(nz[j]) - 1) for j in range(3) if nz[j])
        if material == "neo_hookean":
            grad += 3           # + identity on the diagonal
            cof = 9 * 3         # cofactor matrix: 2 mul + 1 sub each
            det = 5
            coef = 4            # log, mul, sub, div
            stress = 9 * 3      # mu*F + coef*cof
        else:
            cof = det = 0
            coef = 0
            tr_adds = max(0, sum(1 for j in range(3) if nz[j]) - 1)
            # sigma (symmetric, 6 entries): add H_ij+H_ji, mul mu,
            # diagonal adds lmd*tr (mul+add)
            stress = 6 * 2 + 3 * 2 + tr_adds
        force = 0
        for a in range(4):
            for i in range(3):
                terms = sum(1 for j in range(3) if G[a, j] != 0.0)
                if terms:
                    force += 2 * terms - 1 + 1  # muls+adds, then *w
        acc = 12  # out.at[...].add: 3 comps x 4 corners
        total += grad + cof + det + coef + stress + force + acc
    return float(total)


def flops_model(sp) -> dict:
    """Analytic flops/step from the problem dims (VERDICT r4 #7), per
    F_int mode, counting the operator application plus the explicit
    update algebra. Exact loop-structure counts for the stencil kernels;
    2-flops-per-stored-coefficient closed forms for the matrix modes."""
    P, DL = sp.lM.shape
    mode = sp.fint_mode
    if mode in ("dense", "pallas"):
        fint = 2.0 * np.prod(sp.denseK.shape)
    elif mode == "banded":
        # main diagonal blocks applied once, sub-diagonal blocks applied
        # twice (lower + transposed upper)
        fint = 2.0 * np.prod(sp.band_Kd.shape) + 4.0 * np.prod(
            sp.band_Kl.shape
        )
    elif mode == "ell":
        fint = 2.0 * np.prod(sp.ell_blocks.shape)
    elif mode == "ebe":
        fint = 2.0 * np.prod(sp.Ke.shape)
    elif mode in ("stencil", "nh"):
        NX, NY, NZ = sp.nhs_dims
        wrap = bool(getattr(sp, "nhs_wrap", False))
        cells = (NX - 1) * (NY - (0 if wrap else 1)) * (NZ - 1)
        material = "neo_hookean" if mode == "nh" else "linear"
        if getattr(sp, "nhs_Gc", None) is not None:
            per_cell = _stencil_cell_flops(
                np.ones((6, 4, 3)), material  # curvilinear: nothing prunes
            )
        else:
            per_cell = _stencil_cell_flops(np.asarray(sp.nhs_G), material)
        fint = P * cells * per_cell
    else:
        fint = 0.0
    # explicit update algebra per DOF: ~7 flops for the central-difference
    # update, +10 for the TwoSum/renormalize pair when compensated
    update = (17.0 if sp.compensated else 7.0) * P * DL
    return {
        "fint_flops_per_step": float(fint),
        "update_flops_per_step": float(update),
        "flops_per_step": float(fint + update),
        "source": "analytic model (savtpu/utils/roofline.py)",
    }


def bytes_floor_per_step(sp) -> dict:
    """Analytic HBM-traffic floor per step from the problem dims.

    Every step the fused scan body must (a) read the displacement carry
    and write its successor, (b) read the per-DOF coefficient arrays
    (lumped M, preassembled F, Dirichlet mask), and (c) stream the
    operator data of the F_int mode. XLA can fuse everything else; it
    cannot avoid this traffic, so measured bytes/step below this floor
    indicates a measurement bug, and achieved-GB/s computed FROM the
    floor is a conservative %HBM.
    """
    itemsize = np.dtype(sp.lM.dtype).itemsize
    P, DL = sp.lM.shape
    ncarry = 3 if sp.compensated else 2  # (hi, lo, v) vs (d, v)
    nodal_arrays = 2 * ncarry + 3  # carry read+write, lM/F_pre/bc read
    nodal = nodal_arrays * P * DL * itemsize

    mode = sp.fint_mode
    op = 0
    if mode in ("dense", "pallas") and getattr(sp, "denseK", None) is not None:
        op = int(np.prod(sp.denseK.shape)) * itemsize
    elif mode == "banded" and getattr(sp, "band_Kd", None) is not None:
        op = (int(np.prod(sp.band_Kd.shape))
              + int(np.prod(sp.band_Kl.shape))) * itemsize
    elif mode == "ell" and getattr(sp, "ell_blocks", None) is not None:
        # 3x3 block values + column indices stream each step
        op = (int(np.prod(sp.ell_blocks.shape)) * itemsize
              + int(np.prod(sp.ell_cols.shape))
              * np.dtype(sp.ell_cols.dtype).itemsize)
    elif mode == "ebe":
        # per-element 12x12 blocks + connectivity stream each step
        op = int(np.prod(sp.Ke.shape)) * itemsize
    elif mode in ("stencil", "nh"):
        # baked-geometry stencil: no operator stream on a congruent grid;
        # curvilinear grids stream the per-cell gradients
        if getattr(sp, "nhs_Gc", None) is not None:
            op = (int(np.prod(sp.nhs_Gc.shape))
                  + int(np.prod(sp.nhs_dJwc.shape))) * itemsize
    return {
        "bytes_per_step_floor": float(nodal + op),
        "nodal_bytes": float(nodal),
        "operator_bytes": float(op),
        "carry_arrays": ncarry,
    }


def roofline(steps_per_sec: float, *, bytes_per_step: float = 0.0,
             flops_per_step: float = 0.0, device=None) -> dict:
    """Achieved GB/s / GFLOP/s and fractions of the device peaks."""
    out = {
        "achieved_GBps": bytes_per_step * steps_per_sec / 1e9,
        "achieved_GFLOPs": flops_per_step * steps_per_sec / 1e9,
    }
    if bytes_per_step > 0:
        out["arithmetic_intensity_flops_per_byte"] = (
            flops_per_step / bytes_per_step
        )
    peaks = device_peaks(device)
    if peaks:
        out["device_kind"] = peaks["device_kind"]
        out["pct_hbm_peak"] = round(
            100.0 * out["achieved_GBps"] / peaks["hbm_GBps"], 2
        )
        out["pct_vpu_peak_f32"] = round(
            100.0 * out["achieved_GFLOPs"] / (peaks["vpu_tflops_f32"] * 1e3),
            2,
        )
        out["pct_mxu_peak_bf16"] = round(
            100.0 * out["achieved_GFLOPs"] / (peaks["mxu_tflops_bf16"] * 1e3),
            3,
        )
        out["peaks"] = peaks
    return out
