"""Offline feasibility lab for a Prony/matrix-pencil interface surrogate.

Signal model (linear elastodynamics, ramped load — ops/material.py:
linear_ramp ends at t = 1 s): with f(t) = f0 * min(t, 1),
  in-ramp   d(t) = K^-1 f0 * t + sum_k A_k e^{s_k t}      (exact: the
            particular solution of M d'' + K d = c t is linear in t)
  post-ramp d(t) = K^-1 f0   + sum_k B_k e^{s_k (t - 1)}
with the SAME system exponents s_k in both segments. So: estimate s_k
once from the post-ramp portion of the TRAINING half (matrix pencil /
ESPRIT on a Hankel of the decimated signal), then least-squares the
segment amplitudes, and extrapolation to any horizon is closed-form —
no autoregression, hence no closed-loop drift at all.

This lab fits each rank's leading modal coefficients of the recorded
shared-DOF trace (runs/scale_96 stage-1 artifacts) on the first
cut_off=0.5 half and scores the reconstruction on the full span and on
the pure-extrapolation second half. If the extrapolation error is well
under the LSTM's ~6% plateau, arch="expfit" goes into the pipeline.

Usage: python scripts/expfit_lab.py --dir runs/scale_96 [--order 24]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def matrix_pencil(y: np.ndarray, order: int, pencil: int | None = None):
    """Estimate complex exponents z_k (per-sample ratios) of
    y_j ~ sum_k c_k z_k^j via the matrix-pencil method (Hua & Sarkar).
    Returns z of length <= order, |z| clipped to <= 1 (stability: the
    physical system is non-growing; spurious |z|>1 roots explode at
    100k-step horizons)."""
    N = len(y)
    L = pencil or min(max(2 * order, N // 3), N // 2)
    # Hankel: rows j=0..N-L-1, cols l=0..L
    H = np.lib.stride_tricks.sliding_window_view(y, L + 1)  # (N-L, L+1)
    # SVD-truncate to the signal subspace
    U, s, Vt = np.linalg.svd(H, full_matrices=False)
    M = min(order, len(s))
    V = Vt[:M].conj().T          # (L+1, M)
    V0, V1 = V[:-1], V[1:]
    A = np.linalg.pinv(V0) @ V1  # (M, M) shift operator in signal space
    z = np.linalg.eigvals(A)
    mag = np.abs(z)
    z = np.where(mag > 1.0, z / mag, z)
    return z


def fit_amplitudes(y, t, z, extra_cols):
    """LS fit y ~ Re(V c) with V = [extra_cols | z_k^t]; returns the
    complex coefficient vector and the design matrix builder."""
    V = np.concatenate(
        [np.asarray(extra_cols, complex)]
        + [np.power(zk, t)[:, None] for zk in z],
        axis=1,
    )
    # real LS in stacked form: fit real part only (y is real)
    Vr = np.concatenate([V.real, -V.imag], axis=1)
    c, *_ = np.linalg.lstsq(Vr, y, rcond=None)
    m = V.shape[1]
    cc = c[:m] + 1j * c[m:]
    return cc


def eval_model(t, z, cc, extra_fn):
    V = np.concatenate(
        [extra_fn(t)] + [np.power(zk, t)[:, None] for zk in z], axis=1
    )
    return (V @ cc).real


def fit_segmented(y, cut, ramp_end, order, dec):
    """Fit the two-segment exponential model on y[:cut]; return a
    predictor for arbitrary step indices."""
    # exponents from the post-ramp training portion (autonomous regime),
    # decimated for a manageable Hankel. Guard: need a few thousand rows.
    seg = y[ramp_end:cut]
    yd = seg[::dec].astype(np.float64)
    z_d = matrix_pencil(yd - yd.mean(), order)
    z = np.power(z_d, 1.0 / dec)  # per-step ratio
    # keep one copy of conjugate pairs implicitly (complex LS handles it)

    tA = np.arange(0, min(ramp_end, cut), dtype=np.float64)
    tB = np.arange(ramp_end, cut, dtype=np.float64) - ramp_end

    ccA = fit_amplitudes(
        y[: len(tA)], tA, z,
        np.stack([np.ones_like(tA), tA / ramp_end], axis=1),
    )
    ccB = fit_amplitudes(
        y[ramp_end:cut], tB, z,
        np.ones((len(tB), 1)),
    )

    def predict(steps):
        steps = np.asarray(steps, np.float64)
        out = np.empty_like(steps)
        inA = steps < ramp_end
        if inA.any():
            tA_ = steps[inA]
            out[inA] = eval_model(
                tA_, z, ccA,
                lambda t: np.stack(
                    [np.ones_like(t), t / ramp_end], axis=1
                ).astype(complex),
            )
        if (~inA).any():
            tB_ = steps[~inA] - ramp_end
            out[~inA] = eval_model(
                tB_, z, ccB, lambda t: np.ones((len(t), 1), complex)
            )
        return out

    return predict, z


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="runs/scale_96")
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--order", type=int, default=24)
    ap.add_argument("--modal-dim", type=int, default=8)
    ap.add_argument("--dec", type=int, default=1)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--cutoff", type=float, default=0.5)
    ap.add_argument("--ramp-end-s", type=float, default=1.0)
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.io.artifacts import ArtifactStore, load_displacement
    from savtpu.models.modal import from_modal, modal_basis, to_modal

    cfg = Config()
    cfg.workdir = str(Path(args.dir) / "Results")
    cfg.model_dir = str(Path(args.dir) / "Distributed_save")
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())

    # dt from the 96x8x8 generated beam (stage-1 log). The stored trace is
    # save_every-strided; all fitting below works in ROW units, so convert
    # the ramp end to rows once the row count is known.
    dt = 4.3812455420804719e-05
    ramp_end_step = int(round(args.ramp_end_s / dt))

    res = {"order": args.order, "modal_dim": args.modal_dim,
           "ramp_end_step": ramp_end_step, "ranks": {}}
    tot_num = tot_den = 0.0
    tot_num_x = tot_den_x = 0.0
    for r in range(args.parts):
        tr = load_displacement(store.shared_dof_h5(r)).T  # (T, D)
        T = len(tr)
        se = max(args.steps // T, 1)          # stored-row stride in steps
        ramp_end = ramp_end_step // se        # rows
        cut = int(args.cutoff * T)
        mu, basis = modal_basis(tr[:cut], args.modal_dim)
        co = to_modal(tr, mu, basis)          # (T, K)
        K = co.shape[1]
        pred_c = np.empty_like(co)
        for k in range(K):
            predict, z = fit_segmented(
                co[:, k], cut, ramp_end, args.order, args.dec
            )
            pred_c[:, k] = predict(np.arange(T))
        rec = from_modal(pred_c, mu, basis)
        err = rec - tr
        # score beyond warm-up (the deployment span) and extrapolation-only
        w = 3000 // se
        rel = np.linalg.norm(err[w:]) / np.linalg.norm(tr[w:])
        rel_x = np.linalg.norm(err[cut:]) / np.linalg.norm(tr[cut:])
        res["ranks"][r] = {"rel": float(rel), "rel_extrap": float(rel_x)}
        tot_num += float(np.sum(err[w:] ** 2))
        tot_den += float(np.sum(tr[w:] ** 2))
        tot_num_x += float(np.sum(err[cut:] ** 2))
        tot_den_x += float(np.sum(tr[cut:] ** 2))
        print(
            f"rank {r}: shared-row rel {rel*100:.3f}% "
            f"(extrapolation half {rel_x*100:.3f}%)",
            flush=True,
        )
    res["all_rel"] = float(np.sqrt(tot_num / tot_den))
    res["all_rel_extrap"] = float(np.sqrt(tot_num_x / tot_den_x))
    print(
        f"ALL ranks: deployment-span shared-row rel "
        f"{res['all_rel']*100:.3f}%, extrapolation half "
        f"{res['all_rel_extrap']*100:.3f}%"
    )
    out = Path(args.dir) / "expfit_lab.json"
    out.write_text(json.dumps(res, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
