"""LSTM encoder-decoder sequence model in pure JAX.

Same architecture as the reference surrogate (Tools/DNN_tools.py:16-98):
a stacked (default 2-layer) bidirectional LSTM encoder whose last-layer
final (h, c) states — forward/backward concatenated — seed a single-layer
unidirectional LSTM decoder of hidden size 2H with a Linear(2H -> input)
head, decoded *recursively* (each output fed back as the next input,
DNN_tools.py:118-127). Implemented as lax.scan LSTM cells over explicit
parameter pytrees; gate order and initialization follow PyTorch's nn.LSTM
(i, f, g, o gates; U(-1/sqrt(H), 1/sqrt(H))) so the torch-parity tests can
copy weights 1:1.

The whole model is a pytree of arrays — it vmaps over batch *and* over a
leading per-shard model axis (per-shard surrogates are embarrassingly
parallel, SURVEY.md §2.8), and the recursive decode is a scan, so online
prediction of all 150 phase offsets is one batched compiled call.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _uniform(key, shape, k, dtype):
    return jax.random.uniform(key, shape, minval=-k, maxval=k, dtype=dtype)


def init_lstm_cell(key, input_size, hidden_size, dtype=jnp.float32):
    """One LSTM cell, PyTorch layout: W_i (in, 4H), W_h (H, 4H), two biases."""
    k = 1.0 / jnp.sqrt(hidden_size)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "Wi": _uniform(k1, (input_size, 4 * hidden_size), k, dtype),
        "Wh": _uniform(k2, (hidden_size, 4 * hidden_size), k, dtype),
        "bi": _uniform(k3, (4 * hidden_size,), k, dtype),
        "bh": _uniform(k4, (4 * hidden_size,), k, dtype),
    }


def lstm_cell(p, x, h, c):
    """x (B, in), h/c (B, H) -> (h', c'). Gate order i, f, g, o (PyTorch)."""
    z = x @ p["Wi"] + h @ p["Wh"] + p["bi"] + p["bh"]
    i, f, g, o = jnp.split(z, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return h2, c2


def _run_direction(p, xs, reverse: bool):
    """Scan a cell over time. xs (T, B, in) -> (outputs (T, B, H), (h, c))."""
    B = xs.shape[1]
    H = p["Wh"].shape[0]
    h0 = jnp.zeros((B, H), dtype=xs.dtype)

    def step(carry, x):
        h, c = carry
        h, c = lstm_cell(p, x, h, c)
        return (h, c), h

    # scan(reverse=True) emits outputs aligned with forward time: the
    # backward direction's output at t is the state after consuming
    # x[T-1..t], and the final carry is the t=0 state — PyTorch semantics.
    (h, c), outs = jax.lax.scan(step, (h0, h0), xs, reverse=reverse)
    return outs, (h, c)


def init_seq2seq(
    key,
    input_size: int,
    hidden_size: int,
    num_layers_encoder: int = 2,
    bidirectional: bool = True,
    dtype=jnp.float32,
    increment: bool = False,
):
    """Parameter pytree for the encoder-decoder (LSTM_encoder_decoder,
    DNN_tools.py:85-98).

    ``increment=True`` switches the decoder head to INCREMENT-SPACE
    targets (SurrogateConfig.target_mode): each decode step emits
    y_t = y_{t-1} + head(hidden) instead of y_t = head(hidden) — the
    model learns the step-to-step delta and the identity carry rides
    outside the network (a persistence baseline at zero head output).
    The flag is stored as an arithmetic gate ``ginc`` inside the params
    pytree, so stacked/vmapped training, artifact save/load, and every
    predict call site work unchanged."""
    keys = jax.random.split(key, 2 * num_layers_encoder + 2)
    D = 2 if bidirectional else 1
    enc = []
    in_size = input_size
    for l in range(num_layers_encoder):
        layer = {"fwd": init_lstm_cell(keys[2 * l], in_size, hidden_size, dtype)}
        if bidirectional:
            layer["bwd"] = init_lstm_cell(
                keys[2 * l + 1], in_size, hidden_size, dtype
            )
        enc.append(layer)
        in_size = D * hidden_size
    dec_hidden = D * hidden_size
    kd, kf = keys[-2], keys[-1]
    dec = init_lstm_cell(kd, input_size, dec_hidden, dtype)
    kf1, kf2 = jax.random.split(kf)
    kfan = 1.0 / jnp.sqrt(dec_hidden)
    fc = {
        "W": _uniform(kf1, (dec_hidden, input_size), kfan, dtype),
        "b": _uniform(kf2, (input_size,), kfan, dtype),
    }
    out = {"encoder": enc, "decoder": dec, "fc": fc}
    if increment:
        out["ginc"] = jnp.ones((), dtype=dtype)
    return out


def encoder_forward(params, x, dropout: float = 0.0, key=None):
    """x (B, T, input) -> final last-layer states (hn, cn), each (B, D*H)
    with forward/backward concatenated (LSTM_Encoder.forward,
    DNN_tools.py:37-59). ``dropout`` applies between stacked layers
    (PyTorch nn.LSTM semantics: all layers except the last), train-time
    only (pass a PRNG key)."""
    xs = jnp.swapaxes(x, 0, 1)  # (T, B, in)
    hn = cn = None
    n_layers = len(params["encoder"])
    for li, layer in enumerate(params["encoder"]):
        out_f, (hf, cf) = _run_direction(layer["fwd"], xs, reverse=False)
        if "bwd" in layer:
            out_b, (hb, cb) = _run_direction(layer["bwd"], xs, reverse=True)
            xs = jnp.concatenate([out_f, out_b], axis=-1)
            hn = jnp.concatenate([hf, hb], axis=-1)
            cn = jnp.concatenate([cf, cb], axis=-1)
        else:
            xs = out_f
            hn, cn = hf, cf
        if dropout > 0.0 and key is not None and li < n_layers - 1:
            key, sub = jax.random.split(key)
            keep = jax.random.bernoulli(sub, 1.0 - dropout, xs.shape)
            xs = xs * keep / (1.0 - dropout)
    return hn, cn


def decoder_step(params, x, h, c):
    """One recursive decoder step (LSTM_Decoder.forward, DNN_tools.py:77-80):
    x (B, input) -> (y (B, input), h', c')."""
    h2, c2 = lstm_cell(params["decoder"], x, h, c)
    y = h2 @ params["fc"]["W"] + params["fc"]["b"]
    return y, h2, c2


def seq2seq_predict(params, x, n_future: int, feat_mask=None):
    """Full forward: encode x (B, n_past, input), recursively decode
    n_future steps starting from the last input step (model_predict /
    model_train decode loop, DNN_tools.py:118-127, 212-234).
    Returns (B, n_future, input).

    ``feat_mask`` (input,) 0/1 supports ragged input sizes under stacked
    multi-shard training: masked (padded) feature dims are zeroed before
    each recursive feed-back, so they can never leak into the decoder
    state and the padded model is exactly the unpadded one.

    Dispatches on the params pytree: a ``{"lin": ...}`` tree is the
    ridge-map surrogate (SurrogateConfig.arch = "linear",
    models/linear.py) — same (B, n_past, D) -> (B, n_future, D)
    contract, so every caller works with either architecture."""
    if isinstance(params, dict) and "lin" in params:
        from .linear import linear_predict

        return linear_predict(params, x, n_future, feat_mask=feat_mask)
    hn, cn = encoder_forward(params, x)
    x_last = x[:, -1, :]
    ginc = params.get("ginc") if isinstance(params, dict) else None

    def step(carry, _):
        xi, h, c = carry
        y, h, c = decoder_step(params, xi, h, c)
        if ginc is not None:
            # increment-space head: y_t = y_{t-1} + head (target_mode);
            # the gate is a constant, not a trainable (stop_gradient)
            y = y + jax.lax.stop_gradient(ginc) * xi
        if feat_mask is not None:
            y = y * feat_mask
        return (y, h, c), y

    _, ys = jax.lax.scan(step, (x_last, hn, cn), None, length=n_future)
    return jnp.swapaxes(ys, 0, 1)  # (B, n_future, input)


def seq2seq_train_decode(
    params,
    x,
    y_truth,
    n_future: int,
    key,
    tf_ratio: float = 0.0,
    dropout_encoder: float = 0.0,
    dropout_decoder: float = 0.0,
    feat_mask=None,
):
    """Training-time forward with the reference's optional knobs working:
    mixed teacher forcing (the reference's 'mtf' branch at
    DNN_tools.py:128-141 — there broken by a missing import and unused by
    the paper; implemented correctly here: at each decode step the next
    input is the ground truth with probability ``tf_ratio``) and dropout
    (encoder inter-layer + decoder pre-head, DNN_tools.py:30,74-80)."""
    kenc, kdec, ktf = jax.random.split(key, 3)
    hn, cn = encoder_forward(params, x, dropout=dropout_encoder, key=kenc)
    x_last = x[:, -1, :]
    yt = jnp.swapaxes(y_truth, 0, 1)  # (n_future, B, input)
    coins = jax.random.uniform(ktf, (n_future,))
    dkeys = jax.random.split(kdec, n_future)
    ginc = params.get("ginc") if isinstance(params, dict) else None

    def step(carry, inp):
        xi, h, c = carry
        truth_row, coin, dk = inp
        h2, c2 = lstm_cell(params["decoder"], xi, h, c)
        hid = h2
        if dropout_decoder > 0.0:
            keep = jax.random.bernoulli(dk, 1.0 - dropout_decoder, hid.shape)
            hid = hid * keep / (1.0 - dropout_decoder)
        y = hid @ params["fc"]["W"] + params["fc"]["b"]
        if ginc is not None:
            # increment-space head (see seq2seq_predict)
            y = y + jax.lax.stop_gradient(ginc) * xi
        if feat_mask is not None:
            y = y * feat_mask
        nxt = jnp.where(coin < tf_ratio, truth_row, y)
        return (nxt, h2, c2), y

    _, ys = jax.lax.scan(step, (x_last, hn, cn), (yt, coins, dkeys))
    return jnp.swapaxes(ys, 0, 1)


def num_params(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))
