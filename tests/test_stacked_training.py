"""Stacked multi-shard surrogate training: all shards' models in one
vmapped computation with feature padding + masked recursive decode."""

import numpy as np
import jax
import jax.numpy as jnp

from savtpu.config import SurrogateConfig
from savtpu.models import init_seq2seq, scale_forward, strided_windows
from savtpu.models.lstm import seq2seq_predict
from savtpu.models.predictor import (
    phase_interleaved_predict_stacked,
)
from savtpu.models.training import fit_stacked, masked_mse


def _toy_traces(P=3, T=400, Ds=(2, 4, 3)):
    t = np.linspace(0, 15, T)
    traces = []
    for p in range(P):
        D = Ds[p]
        traces.append(
            np.stack(
                [np.sin(0.9 * t + 0.4 * d + p) for d in range(D)], axis=1
            )
        )
    return traces


def _pad_stack(arrs, Dmax):
    out = np.zeros((len(arrs), *arrs[0].shape[:-1], Dmax))
    for p, a in enumerate(arrs):
        out[p, ..., : a.shape[-1]] = a
    return out


def test_fit_stacked_converges_with_ragged_feature_dims():
    traces = _toy_traces()
    Dmax = max(tr.shape[1] for tr in traces)
    cfg = SurrogateConfig(
        hidden_size=12, n_past=8, n_future=8, filter_size=2,
        batch_size=8, learning_rate=5e-3, num_epochs=40, seed=0,
    )
    Xs, Ys, masks = [], [], []
    for tr in traces:
        X, Y = strided_windows(tr, cfg.n_past, cfg.n_future, cfg.filter_size)
        # convention: pad raw windows to Dmax, then scale per shard
        Xs.append(X)
        Ys.append(Y)
        m = np.zeros(Dmax)
        m[: tr.shape[1]] = 1.0
        masks.append(m)
    X = _pad_stack(Xs, Dmax)
    Y = _pad_stack(Ys, Dmax)
    smax = np.array([max(x.max(), y.max()) for x, y in zip(Xs, Ys)])
    smin = np.array([min(x.min(), y.min()) for x, y in zip(Xs, Ys)])
    Xsc = (X - smax[:, None, None, None]) / (smax - smin)[:, None, None, None]
    Ysc = (Y - smax[:, None, None, None]) / (smax - smin)[:, None, None, None]
    fm = np.stack(masks)

    params, hist = fit_stacked(cfg, Xsc, Ysc, fm, log_every=0)
    first, last = hist["train_loss"][0], hist["train_loss"][-1]
    assert (last < first / 5).all(), (first, last)


def test_masked_decode_padded_dims_stay_zero():
    D, Dmax, H = 3, 5, 8
    params = init_seq2seq(jax.random.PRNGKey(0), Dmax, H, 2, True)
    fm = jnp.asarray(np.array([1, 1, 1, 0, 0], dtype=np.float32))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 6, Dmax)).astype(np.float32))
    out = seq2seq_predict(params, x, 4, feat_mask=fm)
    assert np.abs(np.asarray(out)[..., 3:]).max() == 0.0


def test_stacked_predictor_matches_per_shard():
    P, Dmax, H = 2, 6, 8
    n_p = n_f = 3
    n_s = 4
    keys = jax.random.split(jax.random.PRNGKey(1), P)
    stacked = jax.vmap(lambda k: init_seq2seq(k, Dmax, H, 2, True))(keys)
    rng = np.random.default_rng(2)
    hist = rng.normal(size=(P, n_p * n_s, Dmax)).astype(np.float32)
    fm = np.ones((P, Dmax), dtype=np.float32)
    fm[0, 4:] = 0.0
    hist = hist * fm[:, None, :]
    smax = np.array([1.0, 2.0], dtype=np.float32)
    smin = np.array([-1.0, -0.5], dtype=np.float32)

    blocks = np.asarray(
        phase_interleaved_predict_stacked(
            stacked, jnp.asarray(hist), jnp.asarray(smax), jnp.asarray(smin),
            n_p, n_f, n_s, feat_mask=jnp.asarray(fm),
        )
    )
    # per-shard oracle
    for p in range(P):
        params_p = jax.tree.map(lambda a: a[p], stacked)
        offs = np.arange(n_s)
        hidx = offs[:, None] + np.arange(n_p)[None, :] * n_s
        X = scale_forward(hist[p][hidx], smax[p], smin[p])
        Y = seq2seq_predict(
            params_p, jnp.asarray(X), n_f, feat_mask=jnp.asarray(fm[p])
        )
        Y = np.asarray(Y) * (smax[p] - smin[p]) + smax[p]
        Y = Y * fm[p]
        NF = np.zeros((n_s * n_f, Dmax))
        oidx = offs[:, None] + np.arange(n_f)[None, :] * n_s
        NF[oidx.reshape(-1)] = Y.reshape(-1, Dmax)
        assert np.allclose(blocks[p], NF, atol=1e-6)


def test_masked_mse_equals_unpadded():
    rng = np.random.default_rng(0)
    out = rng.normal(size=(4, 3, 5))
    truth = rng.normal(size=(4, 3, 5))
    fm = np.array([1, 1, 1, 0, 0], dtype=float)
    got = float(masked_mse(jnp.asarray(out), jnp.asarray(truth), jnp.asarray(fm)))
    want = float(np.mean((out[..., :3] - truth[..., :3]) ** 2))
    assert abs(got - want) < 1e-12


def test_rollout_windows_training_and_pipeline(tmp_path):
    """rollout_windows>1 trains on chained open-loop windows (the online
    regime) and the full pipeline runs with it; W=1 stays the reference
    behavior (target length checked)."""
    import jax
    import pytest

    from savtpu.config import Config
    from savtpu.models.training import chained_predict, fit, fit_stacked
    from savtpu.models.lstm import init_seq2seq, seq2seq_predict

    # chained_predict semantics: W=1 == seq2seq_predict; W=2 feeds the
    # first window's output back as encoder input
    params = init_seq2seq(jax.random.PRNGKey(0), 4, 6, 2, True)
    X = jax.random.normal(jax.random.PRNGKey(1), (3, 5, 4))
    one = seq2seq_predict(params, X, 5)
    ch1 = chained_predict(params, X, 5, 1)
    assert np.allclose(np.asarray(one), np.asarray(ch1))
    ch2 = chained_predict(params, X, 5, 2)
    assert ch2.shape == (3, 10, 4)
    assert np.allclose(np.asarray(ch2[:, :5]), np.asarray(one))
    second = seq2seq_predict(params, one, 5)  # n_past == n_future here
    assert np.allclose(np.asarray(ch2[:, 5:]), np.asarray(second),
                       atol=1e-6)

    # fit / fit_stacked accept W-chained targets and reject mismatches
    cfg = Config().surrogate
    cfg.n_past = cfg.n_future = 3
    cfg.rollout_windows = 2
    cfg.num_epochs = 2
    cfg.hidden_size = 4
    cfg.batch_size = 2
    rng = np.random.default_rng(0)
    Xw = rng.normal(size=(6, 3, 4))
    Yw = rng.normal(size=(6, 6, 4))
    fit(cfg, Xw, Yw, Xw[:2], Yw[:2], log_every=0)
    fit_stacked(cfg, Xw[None], Yw[None], np.ones((1, 4)), log_every=0)
    with pytest.raises(ValueError, match="rollout_windows"):
        fit(cfg, Xw, Yw[:, :3], log_every=0)

    # full pipeline with rollout_windows=2
    from savtpu.api import Simulation

    pc = Config()
    pc.workdir = str(tmp_path / "Results")
    pc.model_dir = str(tmp_path / "Distributed_save")
    pc.beam_cells = (6, 1, 1)
    pc.beam_extent = (6.0, 1.0, 1.0)
    pc.partition.n_parts = 2
    pc.solver.num_steps = 200
    s = pc.surrogate
    s.n_past = s.n_future = 4
    s.filter_size = 5
    s.cut_off = 1.0
    s.batch_size = 2
    s.num_epochs = 5
    s.hidden_size = 8
    s.rollout_windows = 2
    metrics = Simulation(pc, verbose=False).run_all()
    assert all(np.isfinite(v) for v in metrics.values() if not isinstance(v, int))
