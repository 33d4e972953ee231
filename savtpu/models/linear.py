"""Linear (ridge-regression) surrogate: flat-window affine map.

The reference's surrogate is an LSTM encoder-decoder
(Tools/DNN_tools.py:85-98) because its authors wanted a generic sequence
model. But the plant is LINEAR elastodynamics: on the coarse sampling
grid the map {n_past window} -> {n_future window} of the true shared-DOF
trace is near-affine (exactly affine for free LTI response; the ramped
load adds a mild time dependence the fit averages over). ``arch =
"linear"`` (SurrogateConfig.arch) replaces the LSTM with one ridge map

    y = flat(X) @ W + b,     W: (n_past*D, n_future*D)

fit in CLOSED FORM on the host — no epochs, no optimizer — and applied
online as a single matmul per phase-interleaved batch (MXU-friendly:
(150, n_past*D) @ (n_past*D, n_future*D)).

The params pytree is ``{"lin": {"W": ..., "b": ...}}``;
``models.lstm.seq2seq_predict`` dispatches on the "lin" key, so every
downstream consumer (phase_interleaved_predict{,_stacked}, the fused
block-group runner, chained_predict) works unchanged.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np


def init_linear(n_past: int, n_future: int, D: int, dtype=jnp.float32):
    """Zero-parameter template (used to deserialize saved models)."""
    return {
        "lin": {
            "W": jnp.zeros((n_past * D, n_future * D), dtype),
            "b": jnp.zeros((n_future * D,), dtype),
        }
    }


def linear_predict(params, x, n_future: int, feat_mask=None):
    """(B, n_past, D) scaled windows -> (B, n_future, D) scaled preds.

    Direct multi-horizon regression — no recursion, so no feedback error
    accumulation inside the window. ``feat_mask`` zeroes padded feature
    dims of BOTH input and output (the stacked-training convention of
    seq2seq_predict).

    The matmul runs at HIGHEST precision: on TPU the MXU's default
    bf16-pass product has ~1e-2 relative error on this cancellation-heavy
    map (the ridge W has large near-cancelling coefficients), and the
    online stage feeds the output back — measured on 96x8x8/16, a
    bf16-truncated replay diverges the 33-block loop (rel-L2 1e10) while
    the exact-f32 replay is stable at ~5% shared error. Same failure
    mode and same fix as the FEM matvec (ops/precision.py); cost is one
    (150, n_past*D) x (n_past*D, n_future*D) product per block —
    negligible."""
    import jax

    lin = params["lin"]
    B, n_past, D = x.shape
    if feat_mask is not None:
        x = x * feat_mask
    y = (
        jnp.matmul(
            x.reshape(B, n_past * D), lin["W"],
            precision=jax.lax.Precision.HIGHEST,
        )
        + lin["b"]
    )
    y = y.reshape(B, n_future, D)
    if feat_mask is not None:
        y = y * feat_mask
    return y


def fit_linear_arrays(
    X: np.ndarray,          # (G, n_past, D) SCALED training windows
    Y: np.ndarray,          # (G, n_future, D) scaled targets
    lam_rel: float,
    feat_mask: np.ndarray | None = None,   # (D,) 0/1
) -> Tuple[np.ndarray, np.ndarray]:
    """Closed-form ridge fit in float64; returns (W, b).

    Features and targets are centered so the Tikhonov penalty never
    shrinks the mean; the bias is recovered exactly. ``lam_rel`` scales
    the penalty by the mean feature energy, making it dimensionless.
    Masked (padded) feature dims are zeroed first, which with centering
    forces their W rows/columns to 0 and pushes their constant level into
    b."""
    G = X.shape[0]
    Xf = np.asarray(X, np.float64).reshape(G, -1)
    Yf = np.asarray(Y, np.float64).reshape(G, -1)
    if feat_mask is not None:
        fm = np.asarray(feat_mask, np.float64)
        Xf = Xf * np.tile(fm, X.shape[1])
        Yf = Yf * np.tile(fm, Y.shape[1])
    xm = Xf.mean(axis=0)
    ym = Yf.mean(axis=0)
    Xc = Xf - xm
    Yc = Yf - ym
    A = Xc.T @ Xc
    n = A.shape[0]
    lam = lam_rel * max(np.trace(A) / n, 1e-300)
    W = np.linalg.solve(A + lam * np.eye(n), Xc.T @ Yc)
    b = ym - xm @ W
    return W, b


def stabilize_spectrum(
    W: np.ndarray, rho_max: float
) -> Tuple[np.ndarray, float]:
    """Clip the eigenvalue magnitudes of the SQUARE window map to
    ``rho_max``.

    With n_past == n_future the online block recursion is exactly
    x_{b+1} = x_b @ W per phase offset (the predicted block becomes the
    next history window), so closed-loop stability is rho(W) <= 1. The
    true damped dynamics satisfies this, but a least-squares fit that
    sees the growing load-ramp era can come out expansive — measured:
    rho barely above 1 diverges the 33-block online loop while every
    one-window metric looks fine. Clipping only the expansive
    eigenvalues leaves the (physical, contractive) spectrum untouched.
    Returns (W_stable, rho_before)."""
    lam, V = np.linalg.eig(W)
    mag = np.abs(lam)
    rho = float(mag.max())
    if rho <= rho_max:
        return W, rho
    lam = lam * np.minimum(1.0, rho_max / np.maximum(mag, 1e-300))
    W2 = np.real(V @ np.diag(lam) @ np.linalg.inv(V))
    return W2, rho


def closed_loop_rel(
    W: np.ndarray,
    b: np.ndarray,
    seq: np.ndarray,        # (Tc, D) SCALED coarse-grid sequence
    n_past: int,
    n_future: int,
    noise_rel: float = 1e-5,
) -> float:
    """Autoregressive replay error of the window map on one coarse
    sequence: start from the first n_past rows, repeatedly predict the
    next n_future and feed the prediction back (exactly the online
    stage-4 recursion per phase offset), and compare the whole rollout
    against the true continuation. Returns rel-L2; divergence maps to
    inf.

    This is the metric the one-window train/val losses cannot see: a
    fit map with slightly expansive *non-normal* structure scores
    perfectly per-window yet blows up the 33-block deployed loop
    (measured: ridge=1e-6 on 96x8x8/16 -> val rel ~1e-3 but online
    rel-L2 = 1e10, even with the spectral radius clipped to 0.999 —
    transient growth of a non-normal map is not controlled by its
    eigenvalues).

    Three deployment-matching details, all load-bearing. The rollout
    runs in FLOAT32 (what the online scan feeds back); an unstable mode
    of a clipped-but-ill-conditioned map is seeded at rounding
    amplitude, and a short f64 replay undershoots it by ~8 decades. The
    recursion continues past the end of ``seq`` to ``min_blocks`` total
    iterations with a magnitude tripwire — the training portion covers
    ~15 blocks while deployment runs 33, so latent 2x/block growth that
    is still microscopic at block 15 must be given room to surface. And
    ``noise_rel``-scaled pseudo-noise (fixed seed) is injected into the
    feedback each block: a SELF-CONSISTENT replay of an ill-conditioned
    map can ride a razor's edge that any real deployment falls off —
    measured on 96x8x8/16: a 1e-5 cross-process arithmetic difference in
    the warm-up moved the ridge-1e-6 map's first-block prediction by
    O(1) relative (single-application noise gain ~10x), and the TPU's
    matmul rounding re-excites that gain every block, diverging a loop
    whose noise-free CPU replay scores 5%. The injected noise makes the
    score measure the closed-loop TRANSFER GAIN, not just the clean
    orbit — the same methodology as the repo's boundary-noise transfer
    study (docs/STATUS_r3.md), applied at model-selection time."""
    Tc, D = seq.shape
    n_blocks = (Tc - n_past) // n_future
    if n_blocks < 1:
        return float("inf")
    min_blocks = 48
    W32 = W.astype(np.float32)
    b32 = b.astype(np.float32)
    bound = 20.0 * max(float(np.abs(seq).max()), 1.0)
    rng = np.random.default_rng(0)
    sig = noise_rel * float(np.sqrt(np.mean(seq.astype(np.float64) ** 2)))
    hist = seq[:n_past].astype(np.float32).copy()
    err2 = 0.0
    den2 = 0.0
    t = n_past
    for k in range(max(n_blocks, min_blocks)):
        y = (hist.reshape(1, -1) @ W32 + b32).reshape(n_future, D)
        if sig > 0:
            # white + constant-in-time components: the perturbation that
            # actually destabilized deployment was SMOOTH (a coherent
            # trajectory offset, not jitter) — white noise alone leaves
            # the dangerous low-frequency direction unexcited
            y = y + rng.normal(size=y.shape).astype(np.float32) * sig
            y = y + rng.normal(size=(1, D)).astype(np.float32) * sig
        if not np.all(np.isfinite(y)) or float(np.abs(y).max()) > bound:
            return float("inf")
        if k < n_blocks:
            truth = seq[t : t + n_future]
            err2 += float(
                ((y.astype(np.float64) - truth) ** 2).sum()
            )
            den2 += float((truth**2).sum())
            t += n_future
        hist = np.concatenate([hist, y])[-n_past:]
    if not np.isfinite(err2):
        return float("inf")
    return float(np.sqrt(err2 / max(den2, 1e-300)))


def _metrics(out, truth, feat_mask=None) -> Tuple[float, float, float]:
    """(loss, r2, rel) with masked_metrics/batch_metrics semantics
    (models/training.py)."""
    out = np.asarray(out, np.float64)
    truth = np.asarray(truth, np.float64)
    if feat_mask is None:
        loss = np.mean((out - truth) ** 2)
        var = np.mean((truth - truth.mean()) ** 2)
        ms = np.mean(truth**2)
    else:
        fm = np.asarray(feat_mask, np.float64)
        denom = out.shape[0] * out.shape[1] * fm.sum()
        d = (out - truth) * fm
        loss = (d * d).sum() / denom
        tmean = (truth * fm).sum() / denom
        var = (((truth - tmean) * fm) ** 2).sum() / denom
        ms = ((truth * fm) ** 2).sum() / denom
    return float(loss), float(1.0 - loss / var), float(1.0 - loss / ms)


def fit_linear(
    cfg,
    X_train, Y_train,
    X_val=None, Y_val=None,
    feat_mask=None,
    dtype=None,
    seqs=None,
) -> Tuple[Dict, Dict]:
    """fit()-compatible entry: returns (params, history) with the same
    history keys as the LSTM trainer (one 'epoch' — the exact solve).

    ``seqs`` (optional): list of SCALED coarse-grid sequences (Tc, D)
    from the training portion of the trace — one per phase offset. When
    given, the fit becomes a ridge LADDER with closed-loop model
    selection: each candidate lambda is fit, the deployed stability
    guard applied, and the candidate scored by ``closed_loop_rel``
    autoregressive replay on those sequences; the best (finite,
    smallest) replay error wins. The ladder always contains
    ``cfg.ridge_lambda`` so an explicit setting stays reachable."""
    dtype = jnp.dtype(dtype or cfg.dtype)
    n_future = Y_train.shape[1]
    D = X_train.shape[-1]
    rho_max = float(getattr(cfg, "linear_rho_max", 0.0) or 0.0)

    def fit_one(lam):
        W, b = fit_linear_arrays(X_train, Y_train, lam, feat_mask=feat_mask)
        if rho_max > 0 and W.shape[0] == W.shape[1]:
            W, _ = stabilize_spectrum(W, rho_max)
        return W, b

    chosen_lam = float(cfg.ridge_lambda)
    if seqs:
        # descending: if every candidate diverges (all-inf tie), the
        # strongest regularization — the least-wrong map — is kept
        ladder = sorted(
            {float(cfg.ridge_lambda), 1e-6, 1e-4, 1e-2, 1e-1, 1.0},
            reverse=True,
        )
        best = None
        for lam in ladder:
            W_c, b_c = fit_one(lam)
            score = float(
                np.sqrt(np.mean([
                    closed_loop_rel(W_c, b_c, s, X_train.shape[1], n_future)
                    ** 2
                    for s in seqs
                ]))
            )
            if best is None or score < best[0]:
                best = (score, lam, W_c, b_c)
        _, chosen_lam, W, b = best
    else:
        W, b = fit_one(chosen_lam)
    params = {
        "lin": {"W": jnp.asarray(W, dtype), "b": jnp.asarray(b, dtype)}
    }
    G = X_train.shape[0]
    out_tr = (
        np.asarray(X_train, np.float64).reshape(G, -1) @ W + b
    ).reshape(G, n_future, D)
    tl, tr2, trel = _metrics(out_tr, Y_train, feat_mask)
    hist = {
        "train_loss": [tl], "train_r2": [tr2], "train_rel": [trel],
        "val_loss": [], "val_r2": [], "val_rel": [],
        "ridge_lambda": chosen_lam,
    }
    if X_val is not None and len(X_val) > 0:
        Gv = X_val.shape[0]
        out_va = (
            np.asarray(X_val, np.float64).reshape(Gv, -1) @ W + b
        ).reshape(Gv, n_future, D)
        vl, vr2, vrel = _metrics(out_va, Y_val, feat_mask)
        hist["val_loss"], hist["val_r2"], hist["val_rel"] = (
            [vl], [vr2], [vrel]
        )
    return params, hist
