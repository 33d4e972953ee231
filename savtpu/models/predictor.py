"""Online phase-interleaved predictor.

The reference refills each 3000-step block with a Python loop over 150
phase offsets, each doing a 20-point strided history gather, a single-
sample LSTM predict of 20 coarse steps, and a strided scatter
(Tools/DNN_prediction.py:38-55). On TPU the 150 offsets become ONE batched
seq2seq call of shape (n_s, n_p, D): the history gather is one fancy-index,
the scatter one ``.at[].set``.

Index math (verified against encoder_decoder_predictor): for offset
i in [0, n_s) at global step n, history rows are
    n - n_p*n_s + i + j*n_s,  j = 0..n_p-1        (Npi)
and the predictions fill block rows
    i + j*n_s,                j = 0..n_f-1        (Nfi - n).
Together the n_s offsets cover every row of the (n_s*n_f, D) block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .data import scale_back, scale_forward
from .lstm import seq2seq_predict


@partial(jax.jit, static_argnames=("n_past", "n_future", "filter_size"))
def phase_interleaved_predict(
    params,
    history,            # (n_p * n_s, D): trace rows [n - n_p*n_s, n)
    smax,
    smin,
    n_past: int,
    n_future: int,
    filter_size: int,
    feat_mask=None,     # (D,) for padded-input (stacked-trained) models
):
    """Predict the next (n_f * n_s, D) block from the trailing history.

    ``history`` must be the last n_p*n_s rows of the shared-DOF trace
    (d_sol_shared[n - n_p*n_s : n]); the offset-relative indices then
    simplify to i + j*n_s into this window."""
    n_s = filter_size
    offs = jnp.arange(n_s)
    hist_idx = offs[:, None] + jnp.arange(n_past)[None, :] * n_s
    X = history[hist_idx]                       # (n_s, n_p, D)
    X = scale_forward(X, smax, smin)
    Y = seq2seq_predict(params, X, n_future, feat_mask=feat_mask)
    Y = scale_back(Y, smax, smin)
    if feat_mask is not None:
        Y = Y * feat_mask  # padded dims: scale_back(0) != 0; re-zero

    out_idx = offs[:, None] + jnp.arange(n_future)[None, :] * n_s
    D = history.shape[-1]
    block = jnp.zeros((n_s * n_future, D), dtype=Y.dtype)
    return block.at[out_idx.reshape(-1)].set(Y.reshape(-1, D))


@partial(jax.jit, static_argnames=("n_past", "n_future", "filter_size"))
def phase_interleaved_predict_stacked(
    stacked_params,
    histories,          # (P, n_p*n_s, Dmax) padded trailing windows
    smax,               # (P,)
    smin,               # (P,)
    n_past: int,
    n_future: int,
    filter_size: int,
    feat_mask=None,     # (P, Dmax)
):
    """All shards' block predictions in one vmapped call — pairs with
    models trained by fit_stacked (common padded input size)."""

    def one(params, hist, mx, mn, fm):
        n_s = filter_size
        offs = jnp.arange(n_s)
        hist_idx = offs[:, None] + jnp.arange(n_past)[None, :] * n_s
        X = scale_forward(hist[hist_idx], mx, mn)
        Y = seq2seq_predict(params, X, n_future, feat_mask=fm)
        Y = scale_back(Y, mx, mn)
        if fm is not None:
            Y = Y * fm  # padded dims: scale_back(0) is nonzero; re-zero
        out_idx = offs[:, None] + jnp.arange(n_future)[None, :] * n_s
        block = jnp.zeros((n_s * n_future, hist.shape[-1]), dtype=Y.dtype)
        return block.at[out_idx.reshape(-1)].set(
            Y.reshape(-1, hist.shape[-1])
        )

    if feat_mask is None:
        return jax.vmap(lambda p, h, mx, mn: one(p, h, mx, mn, None))(
            stacked_params, histories, smax, smin
        )
    return jax.vmap(one)(stacked_params, histories, smax, smin, feat_mask)
