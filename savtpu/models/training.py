"""Surrogate training: optax Adam + per-epoch exponential LR decay.

Faithful to the reference loop (Model_training.py:65-139, DNN_tools.py:
103-207): MSE over the recursive n_future decode, Adam(lr0) with
lr = lr0 * decay^epoch (LambdaLR semantics), shuffled mini-batches of size
nB (last ragged batch kept), per-epoch train + validation with R^2 and
relative-error accuracies accumulated per batch and divided by the batch
count. Epoch count = floor(log_decay(lr_min/lr0)) = 3450 at the defaults.

TPU-first mechanics: each epoch's full-size batches are stacked into one
(Nb, nB, T, D) tensor and scanned inside a single jitted update, so an
epoch is one (or two, with a ragged tail) device calls instead of Nb
Python-dispatched steps.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import SurrogateConfig
from .lstm import init_seq2seq, seq2seq_predict, seq2seq_train_decode


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def batch_metrics(out, truth):
    """(loss, r2, rel) of one batch (DNN_tools.py:146-157)."""
    loss = mse(out, truth)
    r2 = 1.0 - loss / mse(truth, jnp.mean(truth))
    rel = 1.0 - loss / jnp.mean(truth**2)
    return loss, r2, rel


@dataclass
class TrainState:
    params: Dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation
    n_future: int

    def loss_fn(self, params, X, Y):
        out = seq2seq_predict(params, X, self.n_future)
        return mse(out, Y), out


def _make_epoch_fns(state: TrainState, cfg=None):
    tx, n_future = state.tx, state.n_future
    method = getattr(cfg, "training_method", "recursive") if cfg else "recursive"
    dp_enc = getattr(cfg, "dropout_encoder", 0.0) if cfg else 0.0
    dp_dec = getattr(cfg, "dropout_decoder", 0.0) if cfg else 0.0
    stochastic = method == "mtf" or dp_enc > 0 or dp_dec > 0

    def loss_fn(params, X, Y):
        out = seq2seq_predict(params, X, n_future)
        loss = mse(out, Y)
        return loss, out

    def loss_fn_mtf(params, X, Y, key, ratio):
        out = seq2seq_train_decode(
            params, X, Y, n_future, key,
            tf_ratio=ratio, dropout_encoder=dp_enc, dropout_decoder=dp_dec,
        )
        return mse(out, Y), out

    def train_batch(carry, batch):
        params, opt_state, ratio, key = carry
        X, Y = batch
        if stochastic:
            key, sub = jax.random.split(key)
            (loss, out), grads = jax.value_and_grad(
                loss_fn_mtf, has_aux=True
            )(params, X, Y, sub, ratio)
            # teacher-forcing ratio decays per batch (DNN_tools.py:160-162)
            ratio = jnp.maximum(ratio - 0.005, 0.0)
        else:
            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, X, Y
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        _, r2, rel = batch_metrics(out, Y)
        return (params, opt_state, ratio, key), jnp.stack([loss, r2, rel])

    @jax.jit
    def train_epoch(params, opt_state, Xb, Yb, ratio, key):
        (params, opt_state, ratio, _), stats = jax.lax.scan(
            train_batch, (params, opt_state, ratio, key), (Xb, Yb)
        )
        return params, opt_state, ratio, stats.sum(axis=0)

    @jax.jit
    def eval_batch(params, X, Y):
        out = seq2seq_predict(params, X, n_future)
        return jnp.stack(batch_metrics(out, Y))

    return train_epoch, eval_batch


def _stack_batches(X, Y, bs):
    """Split (G, ...) into a stacked (Nb, bs, ...) tensor + ragged tail."""
    n_full = (X.shape[0] // bs) * bs
    Xb = X[:n_full].reshape(-1, bs, *X.shape[1:])
    Yb = Y[:n_full].reshape(-1, bs, *Y.shape[1:])
    tail = (X[n_full:], Y[n_full:]) if X.shape[0] > n_full else None
    return Xb, Yb, tail


def evaluate(state: TrainState, X, Y, batch_size: int):
    """Validation pass (model_test, DNN_tools.py:170-207): per-batch metric
    sums / batch count, unshuffled (always deterministic recursive
    decode, like the reference's model_test)."""
    _, eval_batch = _make_epoch_fns(state)
    tot = np.zeros(3)
    nb = 0
    for s in range(0, X.shape[0], batch_size):
        stats = eval_batch(state.params, X[s : s + batch_size], Y[s : s + batch_size])
        tot += np.asarray(stats)
        nb += 1
    return tot / max(nb, 1)


def fit(
    cfg: SurrogateConfig,
    X_train,
    Y_train,
    X_val=None,
    Y_val=None,
    params=None,
    log_every: int = 50,
    log_fn=print,
) -> Tuple[Dict, Dict[str, List[float]]]:
    """Train a seq2seq surrogate; returns (params, history dict)."""
    dtype = jnp.dtype(cfg.dtype)
    X_train = jnp.asarray(X_train, dtype=dtype)
    Y_train = jnp.asarray(Y_train, dtype=dtype)
    input_size = X_train.shape[-1]

    key = jax.random.PRNGKey(cfg.seed)
    kinit, kshuf = jax.random.split(key)
    if params is None:
        params = init_seq2seq(
            kinit,
            input_size,
            cfg.hidden_size,
            cfg.num_layers_encoder,
            cfg.bidirectional,
            dtype=dtype,
        )

    num_epochs = cfg.epochs
    n_train = X_train.shape[0]
    bs = min(cfg.batch_size, n_train)
    steps_per_epoch = -(-n_train // bs)
    schedule = lambda step: cfg.learning_rate * (
        cfg.decay ** (step // steps_per_epoch)
    )
    tx = optax.adam(schedule)
    state = TrainState(params, tx.init(params), tx, cfg.n_future)
    train_epoch, eval_batch = _make_epoch_fns(state, cfg)
    ratio = jnp.asarray(getattr(cfg, "tf_ratio", 0.0), dtype=dtype)
    mkey = jax.random.PRNGKey(cfg.seed + 9)

    hist = {k: [] for k in (
        "train_loss", "train_r2", "train_rel",
        "val_loss", "val_r2", "val_rel",
    )}

    np_rng = np.random.default_rng(cfg.seed + 1)
    params, opt_state = state.params, state.opt_state
    for epoch in range(num_epochs):
        perm = np_rng.permutation(n_train)
        Xs, Ys = X_train[perm], Y_train[perm]
        Xb, Yb, tail = _stack_batches(Xs, Ys, bs)
        nb = Xb.shape[0]
        tot = np.zeros(3)
        if nb:
            mkey, sub = jax.random.split(mkey)
            params, opt_state, ratio, stats = train_epoch(
                params, opt_state, Xb, Yb, ratio, sub
            )
            tot += np.asarray(stats)
        if tail is not None:
            # single ragged batch: reuse the scan body via a length-1 scan
            # (a second compiled shape, cached after epoch 0)
            Xt, Yt = tail
            mkey, sub = jax.random.split(mkey)
            params, opt_state, ratio, stats = train_epoch(
                params, opt_state, Xt[None], Yt[None], ratio, sub
            )
            tot += np.asarray(stats)
            nb += 1
        tot /= max(nb, 1)
        hist["train_loss"].append(float(tot[0]))
        hist["train_r2"].append(float(tot[1]))
        hist["train_rel"].append(float(tot[2]))

        if X_val is not None and len(X_val):
            vt = np.zeros(3)
            vb = 0
            for s in range(0, X_val.shape[0], bs):
                stats = eval_batch(
                    params,
                    jnp.asarray(X_val[s : s + bs], dtype=dtype),
                    jnp.asarray(Y_val[s : s + bs], dtype=dtype),
                )
                vt += np.asarray(stats)
                vb += 1
            vt /= max(vb, 1)
            hist["val_loss"].append(float(vt[0]))
            hist["val_r2"].append(float(vt[1]))
            hist["val_rel"].append(float(vt[2]))

        if log_every and epoch % log_every == 0:
            lr = cfg.learning_rate * cfg.decay**epoch
            log_fn(
                f"epoch {epoch}: train mse {tot[0]:.5e} r2 {tot[1]:.4f}"
                + (
                    f" | val mse {vt[0]:.5e} r2 {vt[1]:.4f}"
                    if X_val is not None and len(X_val)
                    else ""
                )
                + f" | lr {lr:.3e}"
            )

    state.params, state.opt_state = params, opt_state
    return params, hist


# ----------------------------------------------------------------------
# stacked multi-shard training: one model per shard, all trained in one
# vmapped computation (and shardable over a device mesh — the per-shard
# models are embarrassingly parallel, SURVEY.md §2.8 "task parallelism")
# ----------------------------------------------------------------------

def masked_mse(out, truth, feat_mask):
    """MSE over the real (unmasked) feature dims only — equals the
    unpadded per-shard MSE exactly."""
    diff = (out - truth) * feat_mask
    denom = out.shape[0] * out.shape[1] * jnp.sum(feat_mask)
    return jnp.sum(diff * diff) / denom


def masked_metrics(out, truth, feat_mask):
    """(loss, r2, rel) on the real feature dims (batch_metrics semantics,
    DNN_tools.py:146-157, under padding)."""
    loss = masked_mse(out, truth, feat_mask)
    denom = out.shape[0] * out.shape[1] * jnp.sum(feat_mask)
    tmean = jnp.sum(truth * feat_mask) / denom
    var = jnp.sum(((truth - tmean) * feat_mask) ** 2) / denom
    ms = jnp.sum((truth * feat_mask) ** 2) / denom
    return loss, 1.0 - loss / var, 1.0 - loss / ms


def fit_stacked(
    cfg: SurrogateConfig,
    X,            # (P, G, n_past, Dmax) padded with zeros
    Y,            # (P, G, n_future, Dmax)
    feat_mask,    # (P, Dmax) 1 on real feature dims
    mesh=None,    # optional jax Mesh: shard the model axis over devices
    log_every: int = 50,
    log_fn=print,
):
    """Train P independent surrogates simultaneously. Returns
    (stacked_params, hist) where hist arrays have shape (epochs, P)."""
    dtype = jnp.dtype(cfg.dtype)
    X = jnp.asarray(X, dtype=dtype)
    Y = jnp.asarray(Y, dtype=dtype)
    feat_mask = jnp.asarray(feat_mask, dtype=dtype)
    Pn, G, _, Dmax = X.shape
    bs = min(cfg.batch_size, G)
    n_train = int(cfg.train_portion * G)
    n_train -= n_train % bs or 0
    steps_per_epoch = max(n_train // bs, 1)

    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), Pn)
    params = jax.vmap(
        lambda k: init_seq2seq(
            k, Dmax, cfg.hidden_size, cfg.num_layers_encoder,
            cfg.bidirectional, dtype=dtype,
        )
    )(keys)
    schedule = lambda step: cfg.learning_rate * (
        cfg.decay ** (step // steps_per_epoch)
    )
    tx = optax.adam(schedule)
    opt_state = jax.vmap(tx.init)(params)

    # fixed per-shard train/val split (random unordered, like the
    # reference); per-epoch batch shuffling happens on-device
    rng = np.random.default_rng(cfg.seed + 1)
    train_idx = np.stack(
        [rng.choice(G, size=n_train, replace=False) for _ in range(Pn)]
    )
    val_idx = np.stack(
        [np.setdiff1d(np.arange(G), t) for t in train_idx]
    )
    Xtr = jnp.take_along_axis(X, jnp.asarray(train_idx)[:, :, None, None], 1)
    Ytr = jnp.take_along_axis(Y, jnp.asarray(train_idx)[:, :, None, None], 1)
    Xva = jnp.take_along_axis(X, jnp.asarray(val_idx)[:, :, None, None], 1)
    Yva = jnp.take_along_axis(Y, jnp.asarray(val_idx)[:, :, None, None], 1)

    n_future = cfg.n_future

    noise = float(getattr(cfg, "input_noise", 0.0) or 0.0)

    def one_shard_epoch(params, opt_state, Xs, Ys, fm, perm, nkey):
        """One shard, one epoch: scan over shuffled full batches."""
        Xp = Xs[perm][: steps_per_epoch * bs].reshape(
            steps_per_epoch, bs, *Xs.shape[1:]
        )
        Yp = Ys[perm][: steps_per_epoch * bs].reshape(
            steps_per_epoch, bs, *Ys.shape[1:]
        )
        if noise > 0.0:
            # noise-injected training (savtpu extension): robustifies the
            # online block recursion against its own feedback error
            Xp = Xp + noise * jax.random.normal(nkey, Xp.shape, Xp.dtype) * fm

        def train_batch(carry, batch):
            params, opt_state = carry
            Xb, Yb = batch

            def loss_fn(p):
                out = seq2seq_predict(p, Xb, n_future, feat_mask=fm)
                return masked_mse(out, Yb, fm), out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            _, r2, rel = masked_metrics(out, Yb, fm)
            return (params, opt_state), jnp.stack([loss, r2, rel])

        (params, opt_state), stats = jax.lax.scan(
            train_batch, (params, opt_state), (Xp, Yp)
        )
        return params, opt_state, stats.mean(axis=0)

    def one_shard_eval(params, Xs, Ys, fm):
        out = seq2seq_predict(params, Xs, n_future, feat_mask=fm)
        return jnp.stack(masked_metrics(out, Ys, fm))

    def epoch_all(params, opt_state, perms, nkeys):
        return jax.vmap(one_shard_epoch)(
            params, opt_state, Xtr, Ytr, feat_mask, perms, nkeys
        )

    def eval_all(params):
        return jax.vmap(one_shard_eval)(params, Xva, Yva, feat_mask)

    if mesh is not None:
        # pjit-style model parallelism: every stacked tensor is sharded on
        # its leading per-shard axis; the vmapped epoch is embarrassingly
        # parallel along it, so XLA partitions it with zero collectives.
        from jax.sharding import NamedSharding, PartitionSpec as PS

        shard = NamedSharding(mesh, PS(mesh.axis_names[0]))
        put = lambda t: jax.tree.map(
            lambda a: jax.device_put(a, shard), t
        )
        Xtr, Ytr, Xva, Yva = put(Xtr), put(Ytr), put(Xva), put(Yva)
        feat_mask = put(feat_mask)
        params, opt_state = put(params), put(opt_state)
    epoch_all = jax.jit(epoch_all)
    eval_all = jax.jit(eval_all)

    hist = {k: [] for k in (
        "train_loss", "train_r2", "train_rel",
        "val_loss", "val_r2", "val_rel",
    )}
    np_rng = np.random.default_rng(cfg.seed + 2)
    for epoch in range(cfg.epochs):
        perms = jnp.asarray(
            np.stack([np_rng.permutation(n_train) for _ in range(Pn)])
        )
        nkeys = jax.vmap(
            lambda s: jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 3), s)
        )(jnp.arange(epoch * Pn, (epoch + 1) * Pn))
        params, opt_state, tl = epoch_all(params, opt_state, perms, nkeys)
        vl = eval_all(params)
        tl, vl = np.asarray(tl), np.asarray(vl)  # (P, 3)
        for j, k in enumerate(("loss", "r2", "rel")):
            hist[f"train_{k}"].append(tl[:, j])
            hist[f"val_{k}"].append(vl[:, j])
        if log_every and epoch % log_every == 0:
            log_fn(
                f"epoch {epoch}: train mse {tl[:, 0]} | val mse {vl[:, 0]}"
            )
    hist = {k: np.stack(v) for k, v in hist.items()}
    return params, hist
