"""Surrogate tests: JAX LSTM encoder-decoder forward parity against a
PyTorch implementation with identical weights (torch ships in the image as
the independent oracle), training convergence, data pipeline semantics,
and phase-interleaved predictor index math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from savtpu.config import SurrogateConfig
from savtpu.models import (
    encoder_forward,
    fit,
    init_seq2seq,
    phase_interleaved_predict,
    scale_back,
    scale_forward,
    scale_to_zero_one,
    seq2seq_predict,
    strided_windows,
    train_val_split,
)

torch = pytest.importorskip("torch")


def _copy_torch_lstm_weights(params, enc_lstm, dec_lstm, fc):
    """Copy our pytree weights into torch modules (1:1 layout)."""
    sd = {}
    for l, layer in enumerate(params["encoder"]):
        for suffix, cell in (("", layer["fwd"]), ("_reverse", layer["bwd"])):
            sd[f"weight_ih_l{l}{suffix}"] = torch.tensor(
                np.asarray(cell["Wi"]).T.copy()
            )
            sd[f"weight_hh_l{l}{suffix}"] = torch.tensor(
                np.asarray(cell["Wh"]).T.copy()
            )
            sd[f"bias_ih_l{l}{suffix}"] = torch.tensor(
                np.asarray(cell["bi"]).copy()
            )
            sd[f"bias_hh_l{l}{suffix}"] = torch.tensor(
                np.asarray(cell["bh"]).copy()
            )
    enc_lstm.load_state_dict(sd)
    dec = params["decoder"]
    dec_lstm.load_state_dict(
        {
            "weight_ih_l0": torch.tensor(np.asarray(dec["Wi"]).T.copy()),
            "weight_hh_l0": torch.tensor(np.asarray(dec["Wh"]).T.copy()),
            "bias_ih_l0": torch.tensor(np.asarray(dec["bi"]).copy()),
            "bias_hh_l0": torch.tensor(np.asarray(dec["bh"]).copy()),
        }
    )
    fc.load_state_dict(
        {
            "weight": torch.tensor(np.asarray(params["fc"]["W"]).T.copy()),
            "bias": torch.tensor(np.asarray(params["fc"]["b"]).copy()),
        }
    )


def test_seq2seq_matches_torch():
    """Bit-level architecture parity: same weights => same outputs as a
    torch 2-layer bidirectional encoder + 1-layer decoder + linear head
    driven exactly like Tools/DNN_tools.py:212-234."""
    input_size, H, T, B, n_future = 6, 10, 12, 3, 7
    key = jax.random.PRNGKey(42)
    params = init_seq2seq(key, input_size, H, 2, True, dtype=jnp.float64)

    enc = torch.nn.LSTM(
        input_size, H, num_layers=2, batch_first=True, bidirectional=True
    ).double()
    dec = torch.nn.LSTM(input_size, 2 * H, num_layers=1, batch_first=True).double()
    fc = torch.nn.Linear(2 * H, input_size).double()
    _copy_torch_lstm_weights(params, enc, dec, fc)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, input_size))

    # --- torch forward (reference decode loop semantics) ---
    with torch.no_grad():
        xt = torch.tensor(x)
        _, (hn, cn) = enc(xt)
        hn = hn.view(2, 2, B, H)[-1]   # last layer, both directions
        cn = cn.view(2, 2, B, H)[-1]
        h = torch.cat((hn[0], hn[1]), 1).unsqueeze(0)
        c = torch.cat((cn[0], cn[1]), 1).unsqueeze(0)
        h_enc = h.clone()
        xi = xt[:, -1, :]
        outs = []
        for _ in range(n_future):
            o, (h, c) = dec(xi.unsqueeze(1), (h, c))
            y = fc(o.squeeze(1))
            outs.append(y)
            xi = y
        ref = torch.stack(outs, dim=1).numpy()

    # --- ours ---
    hn_j, cn_j = encoder_forward(params, jnp.asarray(x))
    assert np.allclose(np.asarray(hn_j), h_enc.squeeze(0).numpy(), atol=1e-12)
    out = np.asarray(seq2seq_predict(params, jnp.asarray(x), n_future))
    assert np.allclose(out, ref, atol=1e-12)


def test_training_converges_on_toy_sequence():
    """Short training on a smooth multivariate signal: loss must drop >10x
    and R^2 approach 1 (reference quality bar, Model_training.py curves)."""
    t = np.linspace(0, 20, 800)
    D = 4
    sig = np.stack(
        [np.sin(0.7 * t + 0.3 * d) * (1 + 0.1 * d) for d in range(D)], axis=1
    )
    X, Y = strided_windows(sig, n_past=10, n_future=10, filter_size=2)
    X, Y, smax, smin = scale_to_zero_one(X, Y)
    cfg = SurrogateConfig(
        hidden_size=16,
        n_past=10,
        n_future=10,
        filter_size=2,
        batch_size=16,
        learning_rate=5e-3,
        num_epochs=60,
        seed=0,
    )
    rng = np.random.default_rng(0)
    tr, va = train_val_split(len(X), 0.75, rng)
    params, hist = fit(
        cfg, X[tr], Y[tr], X[va], Y[va], log_every=0
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0] / 10
    assert hist["val_r2"][-1] > 0.95


def test_strided_windows_semantics():
    T, D = 100, 3
    data = np.arange(T * D, dtype=float).reshape(T, D)
    X, Y = strided_windows(data, n_past=4, n_future=2, filter_size=5, cut_off=0.5)
    # 50 rows -> stride 5 -> 10 rows -> 10-2-4+1 = 5 windows
    assert X.shape == (5, 4, 3) and Y.shape == (5, 2, 3)
    assert np.array_equal(X[0], data[[0, 5, 10, 15]])
    assert np.array_equal(Y[0], data[[20, 25]])
    assert np.array_equal(X[1], data[[5, 10, 15, 20]])


def test_scaling_round_trip_and_range():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(5, 4, 3))
    Y = rng.normal(size=(5, 2, 3))
    Xs, Ys, smax, smin = scale_to_zero_one(X, Y)
    allv = np.concatenate([Xs.ravel(), Ys.ravel()])
    assert allv.min() >= -1 - 1e-12 and allv.max() <= 0 + 1e-12
    assert np.allclose(scale_back(Xs, smax, smin), X)
    assert np.allclose(scale_forward(X, smax, smin), Xs)


def test_scaling_per_feature_round_trip():
    rng = np.random.default_rng(1)
    # feature amplitudes spanning 4 orders of magnitude (near-wall vs tip)
    amps = np.array([1.0, 1e-2, 1e-4])
    X = rng.normal(size=(6, 4, 3)) * amps
    Y = rng.normal(size=(6, 2, 3)) * amps
    Xs, Ys, smax, smin = scale_to_zero_one(X, Y, mode="per_feature")
    assert smax.shape == (3,) and smin.shape == (3,)
    # every feature uses its full [-1, 0] range (the point of the mode:
    # joint scaling would squash feature 2 into ~1e-4 of the range)
    for d in range(2):  # feature 2's range may be floored
        assert Xs[..., d].min() <= -0.9 or Ys[..., d].min() <= -0.9
        assert np.isclose(max(Xs[..., d].max(), Ys[..., d].max()), 0.0)
    assert np.allclose(scale_back(Xs, smax, smin), X)
    assert np.allclose(scale_forward(X, smax, smin), Xs)
    # near-constant feature: range floored, noise not amplified
    Xc = X.copy(); Yc = Y.copy()
    Xc[..., 2] = 5.0 + 1e-12 * rng.normal(size=Xc[..., 2].shape)
    Yc[..., 2] = 5.0
    _, _, smax2, smin2 = scale_to_zero_one(Xc, Yc, mode="per_feature")
    assert smax2[2] - smin2[2] >= 1e-3 * (smax2.max() - smin2.min()) * 0.99


def test_phase_interleaved_predictor_matches_loop_oracle():
    """The one-shot batched predictor must equal the reference's per-offset
    loop (DNN_prediction.py:38-55) run with the same model."""
    D, H = 3, 8
    n_p = n_f = 4
    n_s = 6
    params = init_seq2seq(jax.random.PRNGKey(1), D, H, 2, True, dtype=jnp.float64)
    rng = np.random.default_rng(2)
    n = n_p * n_s + 11  # current global step
    d_sol = rng.normal(size=(n, D))
    smax, smin = 1.5, -0.7

    block = np.asarray(
        phase_interleaved_predict(
            params, jnp.asarray(d_sol[n - n_p * n_s : n]), smax, smin,
            n_p, n_f, n_s,
        )
    )

    # loop oracle with the reference's absolute indices
    NF = np.zeros((n_s * n_f, D))
    for i in range(n_s):
        Npi = np.arange(i + n - n_p * n_s, i + n - 1, n_s)
        Nfi = np.arange(i + n, n + i + n_f * n_s - 1, n_s)
        Xh = scale_forward(d_sol[Npi], smax, smin)
        out = seq2seq_predict(params, jnp.asarray(Xh)[None], n_f)[0]
        NF[Nfi - n] = np.asarray(scale_back(out, smax, smin))
    assert np.allclose(block, NF, atol=1e-12)


def test_mtf_and_dropout_training_path():
    """Mixed teacher forcing + dropout (the reference carries these knobs
    but its 'mtf' branch is broken/unused; ours works): training converges
    and with tf_ratio=0 / dropout=0 the stochastic path reduces to the
    recursive decode exactly."""
    from savtpu.models.lstm import seq2seq_train_decode

    t = np.linspace(0, 20, 600)
    D = 3
    sig = np.stack([np.sin(0.8 * t + 0.4 * d) for d in range(D)], axis=1)
    X, Y = strided_windows(sig, n_past=8, n_future=8, filter_size=2)
    X, Y, smax, smin = scale_to_zero_one(X, Y)
    cfg = SurrogateConfig(
        hidden_size=12, n_past=8, n_future=8, filter_size=2,
        batch_size=16, learning_rate=5e-3, num_epochs=40, seed=0,
        training_method="mtf", tf_ratio=0.6,
        dropout_encoder=0.1, dropout_decoder=0.1,
    )
    rng = np.random.default_rng(0)
    tr, va = train_val_split(len(X), 0.75, rng)
    params, hist = fit(cfg, X[tr], Y[tr], X[va], Y[va], log_every=0)
    assert hist["train_loss"][-1] < hist["train_loss"][0] / 3
    assert hist["val_r2"][-1] > 0.9

    # degenerate stochastic path == deterministic recursive decode
    p2 = init_seq2seq(jax.random.PRNGKey(3), D, 8, 2, True, dtype=jnp.float64)
    xb = jnp.asarray(np.random.default_rng(1).normal(size=(2, 8, D)))
    yb = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, D)))
    out_s = seq2seq_train_decode(
        p2, xb, yb, 8, jax.random.PRNGKey(0), tf_ratio=0.0,
        dropout_encoder=0.0, dropout_decoder=0.0,
    )
    out_d = seq2seq_predict(p2, xb, 8)
    assert np.allclose(np.asarray(out_s), np.asarray(out_d), atol=1e-12)


def test_increment_mode_decode_and_persistence():
    """target_mode='increment' (VERDICT r4 #6): the decoder emits
    y_t = y_{t-1} + head, the gate rides in the params pytree (so
    save/load templates and stacked vmap work unchanged), and zero head
    output degenerates to persistence of the last input row."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from savtpu.models.lstm import init_seq2seq, seq2seq_predict

    p = init_seq2seq(jax.random.PRNGKey(0), 3, 4, increment=True)
    assert "ginc" in p and float(p["ginc"]) == 1.0
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, 3)),
                    jnp.float32)
    y = seq2seq_predict(p, x, 4)
    assert y.shape == (2, 4, 3)
    # zero the head -> pure persistence of x[:, -1]
    pz = dict(p)
    pz["fc"] = {"W": p["fc"]["W"] * 0.0, "b": p["fc"]["b"] * 0.0}
    yz = seq2seq_predict(pz, x, 4)
    assert np.allclose(np.asarray(yz), np.asarray(x[:, -1:, :]), atol=0)
    # the gate takes no gradient (it is a constant, not a weight)
    g = jax.grad(lambda q: jnp.sum(seq2seq_predict(q, x, 2) ** 2))(p)
    assert float(jnp.abs(g["ginc"])) == 0.0
