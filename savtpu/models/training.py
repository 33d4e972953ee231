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

import time

from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import SurrogateConfig
from .lstm import init_seq2seq, seq2seq_predict, seq2seq_train_decode


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def chained_predict(params, X, n_future, n_windows, feat_mask=None):
    """Decode ``n_windows`` chained windows of ``n_future`` steps: after
    the first window the encoder input is the model's own previous
    predictions (the trailing n_past steps of input++output) — the exact
    open-loop regime of the online phase, where the shared-DOF history is
    pure model feedback after warm-up (Online_predictor.py:298-301).
    Returns (B, n_windows*n_future, D)."""
    from .lstm import seq2seq_predict

    n_past = X.shape[1]
    outs = []
    x = X
    for _ in range(n_windows):
        out = seq2seq_predict(params, x, n_future, feat_mask=feat_mask)
        outs.append(out)
        x = jnp.concatenate([x, out], axis=1)[:, -n_past:, :]
    return outs[0] if n_windows == 1 else jnp.concatenate(outs, axis=1)


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
    seqs=None,
) -> Tuple[Dict, Dict[str, List[float]]]:
    """Train a seq2seq surrogate; returns (params, history dict).

    The ENTIRE training run — per-epoch on-device shuffling, the batch
    scan, the ragged tail batch, and validation — is one lax.scan over
    epochs inside one jit: a single device dispatch for all 3450 epochs.
    (A per-epoch-dispatch variant measured 20x slower through a
    high-latency device link.)

    With ``cfg.arch == "linear"`` the whole 'training' is one closed-form
    ridge solve on host (models/linear.py) returning a single-entry
    history."""
    if getattr(cfg, "arch", "lstm") == "linear":
        from .linear import fit_linear

        if Y_train.shape[1] != cfg.n_future:
            raise ValueError(
                "arch='linear' fits one direct n_past->n_future map; set "
                "rollout_windows = 1"
            )
        return fit_linear(
            cfg, np.asarray(X_train), np.asarray(Y_train),
            None if X_val is None else np.asarray(X_val),
            None if Y_val is None else np.asarray(Y_val),
            seqs=seqs,
        )
    dtype = jnp.dtype(cfg.dtype)
    X = jnp.asarray(X_train, dtype=dtype)
    Y = jnp.asarray(Y_train, dtype=dtype)
    input_size = X.shape[-1]

    kinit, _ = jax.random.split(jax.random.PRNGKey(cfg.seed))
    if params is None:
        params = init_seq2seq(
            kinit, input_size, cfg.hidden_size, cfg.num_layers_encoder,
            cfg.bidirectional, dtype=dtype,
            increment=getattr(cfg, "target_mode", "absolute") == "increment",
        )

    num_epochs = cfg.epochs
    n_train = X.shape[0]
    bs = min(cfg.batch_size, n_train)
    nb_full, r = divmod(n_train, bs)
    steps_per_epoch = nb_full + (1 if r else 0)
    schedule = lambda step: cfg.learning_rate * (
        cfg.decay ** (step // steps_per_epoch)
    )
    tx = optax.adam(schedule)
    opt_state = tx.init(params)

    n_future = cfg.n_future
    n_windows = int(getattr(cfg, "rollout_windows", 1) or 1)
    method = getattr(cfg, "training_method", "recursive")
    dp_enc = getattr(cfg, "dropout_encoder", 0.0)
    dp_dec = getattr(cfg, "dropout_decoder", 0.0)
    stochastic = method == "mtf" or dp_enc > 0 or dp_dec > 0
    if n_windows > 1 and stochastic:
        raise ValueError(
            "rollout_windows > 1 requires the deterministic recursive "
            "training method (no mtf/dropout)"
        )
    if Y.shape[1] != n_windows * n_future:
        raise ValueError(
            f"targets have {Y.shape[1]} steps; expected rollout_windows * "
            f"n_future = {n_windows * n_future}"
        )
    ratio0 = jnp.asarray(
        getattr(cfg, "tf_ratio", 0.0) if method == "mtf" else 0.0, dtype
    )
    base_key = jax.random.PRNGKey(cfg.seed + 9)

    has_val = X_val is not None and len(X_val) > 0
    if has_val:
        Xv = jnp.asarray(X_val, dtype=dtype)
        Yv = jnp.asarray(Y_val, dtype=dtype)
        nv = Xv.shape[0]
        vb_full, vr = divmod(nv, bs)
        Xvb = Xv[: vb_full * bs].reshape(vb_full, bs, *Xv.shape[1:])
        Yvb = Yv[: vb_full * bs].reshape(vb_full, bs, *Yv.shape[1:])
        Xvt, Yvt = Xv[vb_full * bs :], Yv[vb_full * bs :]
        v_batches = vb_full + (1 if vr else 0)

    def batch_step(carry, batch):
        params, opt_state, ratio, key = carry
        Xb, Yb = batch
        if stochastic:
            key, sub = jax.random.split(key)

            def loss_fn(p):
                out = seq2seq_train_decode(
                    p, Xb, Yb, n_future, sub, tf_ratio=ratio,
                    dropout_encoder=dp_enc, dropout_decoder=dp_dec,
                )
                return mse(out, Yb), out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
            # teacher-forcing ratio decays per batch (DNN_tools.py:160-162)
            ratio = jnp.maximum(ratio - 0.005, 0.0)
        else:

            def loss_fn(p):
                out = chained_predict(p, Xb, n_future, n_windows)
                return mse(out, Yb), out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params
            )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        _, r2, rel = batch_metrics(out, Yb)
        return (params, opt_state, ratio, key), jnp.stack([loss, r2, rel])

    def eval_metrics(params):
        tot = jnp.zeros(3, dtype)
        if vb_full:

            def ev(c, b):
                Xb, Yb = b
                out = chained_predict(params, Xb, n_future, n_windows)
                return c + jnp.stack(batch_metrics(out, Yb)), None

            tot, _ = jax.lax.scan(ev, tot, (Xvb, Yvb))
        if has_val and vr:
            out = chained_predict(params, Xvt, n_future, n_windows)
            tot = tot + jnp.stack(batch_metrics(out, Yvt))
        return tot / max(v_batches, 1)

    def epoch_body(carry, eidx):
        params, opt_state, ratio = carry
        kperm, kdrop = jax.random.split(jax.random.fold_in(base_key, eidx))
        perm = jax.random.permutation(kperm, n_train)
        Xs, Ys = X[perm], Y[perm]
        c = (params, opt_state, ratio, kdrop)
        tot = jnp.zeros(3, dtype)
        if nb_full:
            Xb = Xs[: nb_full * bs].reshape(nb_full, bs, *X.shape[1:])
            Yb = Ys[: nb_full * bs].reshape(nb_full, bs, *Y.shape[1:])
            c, stats = jax.lax.scan(batch_step, c, (Xb, Yb))
            tot = tot + stats.sum(axis=0)
        if r:
            c, stats_t = batch_step(
                c, (Xs[nb_full * bs :], Ys[nb_full * bs :])
            )
            tot = tot + stats_t
        params, opt_state, ratio, _ = c
        tot = tot / steps_per_epoch
        vtot = eval_metrics(params) if has_val else jnp.zeros(3, dtype)
        return (params, opt_state, ratio), jnp.concatenate([tot, vtot])

    @jax.jit
    def run(params, opt_state):
        return jax.lax.scan(
            epoch_body, (params, opt_state, ratio0), jnp.arange(num_epochs)
        )

    (params, opt_state, _), hist_arr = run(params, opt_state)
    hist_arr = np.asarray(hist_arr)
    hist = {
        "train_loss": hist_arr[:, 0].tolist(),
        "train_r2": hist_arr[:, 1].tolist(),
        "train_rel": hist_arr[:, 2].tolist(),
        "val_loss": hist_arr[:, 3].tolist() if has_val else [],
        "val_r2": hist_arr[:, 4].tolist() if has_val else [],
        "val_rel": hist_arr[:, 5].tolist() if has_val else [],
    }
    if log_every:
        for ep in range(0, num_epochs, log_every):
            msg = (
                f"epoch {ep}: train mse {hist_arr[ep, 0]:.5e} "
                f"r2 {hist_arr[ep, 1]:.4f}"
            )
            if has_val:
                msg += (
                    f" | val mse {hist_arr[ep, 3]:.5e} "
                    f"r2 {hist_arr[ep, 4]:.4f}"
                )
            log_fn(msg)
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
    seqs=None,    # per-rank lists of scaled coarse sequences (linear
                  # arch closed-loop ridge selection; see fit_linear)
):
    """Train P independent surrogates simultaneously. Returns
    (stacked_params, hist) where hist arrays have shape (epochs, P)."""
    if getattr(cfg, "arch", "lstm") == "linear":
        return _fit_stacked_linear(
            cfg, X, Y, feat_mask, log_fn=log_fn, seqs=seqs
        )
    dtype = jnp.dtype(cfg.dtype)
    X = jnp.asarray(X, dtype=dtype)
    Y = jnp.asarray(Y, dtype=dtype)
    feat_mask = jnp.asarray(feat_mask, dtype=dtype)
    Pn, G, _, Dmax = X.shape
    # full batches only (the scan needs static shapes); clamp bs so tiny
    # window counts still yield at least one batch
    n_train = max(int(cfg.train_portion * G), 1)
    bs = min(cfg.batch_size, n_train)
    n_train -= n_train % bs
    steps_per_epoch = max(n_train // bs, 1)

    keys = jax.random.split(jax.random.PRNGKey(cfg.seed), Pn)
    params = jax.vmap(
        lambda k: init_seq2seq(
            k, Dmax, cfg.hidden_size, cfg.num_layers_encoder,
            cfg.bidirectional, dtype=dtype,
            increment=getattr(cfg, "target_mode", "absolute") == "increment",
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
    n_windows = int(getattr(cfg, "rollout_windows", 1) or 1)
    if Y.shape[2] != n_windows * n_future:
        raise ValueError(
            f"targets have {Y.shape[2]} steps; expected rollout_windows * "
            f"n_future = {n_windows * n_future}"
        )

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
                out = chained_predict(p, Xb, n_future, n_windows,
                                      feat_mask=fm)
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
        out = chained_predict(params, Xs, n_future, n_windows, feat_mask=fm)
        return jnp.stack(masked_metrics(out, Ys, fm))

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

    base_key = jax.random.PRNGKey(cfg.seed + 2)
    nbase_key = jax.random.PRNGKey(cfg.seed + 3)

    # Training runs as a jitted scan over epochs, dispatched in bounded
    # chunks (default 250 epochs per dispatch): one dispatch per chunk is
    # still negligible overhead over high-latency links, while a single
    # multi-minute dispatch for all 3450 epochs trips the remote TPU
    # worker's watchdog at large model counts (observed crash at 16 shards
    # x 486 features). The global epoch index is threaded through as scan
    # xs so chunked and unchunked runs are bit-identical.
    # The datasets are jit ARGUMENTS, not closure captures: captured arrays
    # become HLO constants, and at 16+ shards the embedded ~100MB blows the
    # remote-compile request limit (HTTP 413) and the compile cache.
    @partial(jax.jit, static_argnames=("n_epochs",))
    def run(params, opt_state, Xtr, Ytr, Xva, Yva, feat_mask, e0,
            n_epochs):
        def epoch_body(carry, eidx):
            params, opt_state = carry
            pkeys = jax.vmap(
                lambda sh: jax.random.fold_in(
                    jax.random.fold_in(base_key, eidx), sh
                )
            )(jnp.arange(Pn))
            perms = jax.vmap(
                lambda k: jax.random.permutation(k, n_train)
            )(pkeys)
            nkeys = jax.vmap(
                lambda sh: jax.random.fold_in(
                    jax.random.fold_in(nbase_key, eidx), sh
                )
            )(jnp.arange(Pn))
            params, opt_state, tl = jax.vmap(one_shard_epoch)(
                params, opt_state, Xtr, Ytr, feat_mask, perms, nkeys
            )
            vl = jax.vmap(one_shard_eval)(params, Xva, Yva, feat_mask)
            return (params, opt_state), (tl, vl)

        return jax.lax.scan(
            epoch_body, (params, opt_state), e0 + jnp.arange(n_epochs)
        )

    # CLOSED-LOOP dispatch sizing: the remote worker's watchdog kills
    # multi-minute single dispatches, and the open-loop per-epoch flop
    # model mispredicted in both directions (r4's quadratic shard pad
    # shrank chunks 4x; relaxing it to sqrt crashed the 256-shard hybrid
    # fit with a too-long first dispatch — a kernel-fault worker crash,
    # r5 queue A). Instead, probe: run a small first chunk, measure the
    # wall of each dispatch, and size subsequent chunks from the MEASURED
    # rate targeting ~15 s/dispatch — the probe discipline of
    # ShardedSolver.run_streamed. n_epochs is a static jit arg, so each
    # distinct size compiles once; sizing is frozen after the second
    # resize to bound compiles at <=4 (probe, bootstrap, cruise, tail).
    cap = max(1, min(int(getattr(cfg, "epoch_chunk", 0) or 250),
                     cfg.epochs))
    target_s = 15.0
    probe = max(1, min(10, cap))
    chunk = probe
    tls, vls = [], []
    done = 0
    n_dispatch = 0
    t_fit = time.perf_counter()
    while done < cfg.epochs:
        n = min(chunk, cfg.epochs - done)
        t0 = time.perf_counter()
        (params, opt_state), (tl_c, vl_c) = run(
            params, opt_state, Xtr, Ytr, Xva, Yva, feat_mask,
            jnp.asarray(done), n,
        )
        tls.append(np.asarray(tl_c))  # np.asarray blocks on the dispatch
        vls.append(np.asarray(vl_c))
        done += n
        if n_dispatch < 2:
            # dispatch 0 includes compile -> its rate UNDER-estimates,
            # giving a safe bootstrap chunk; dispatch 1 re-sizes cleanly
            rate = n / max(time.perf_counter() - t0, 1e-6)
            chunk = max(probe, min(cap, int(rate * target_s)))
        n_dispatch += 1
        if log_every:
            # per-dispatch heartbeat: at production scale a full fit is
            # tens of minutes, and a silent gap is indistinguishable
            # from a wedged device client (docs/STATUS_r5.md §2)
            el = time.perf_counter() - t_fit
            log_fn(
                f"  [fit_stacked] {done}/{cfg.epochs} epochs "
                f"({el:.0f}s, dispatch {n_dispatch})"
            )
    tl = np.concatenate(tls)
    vl = np.concatenate(vls)
    tl, vl = np.asarray(tl), np.asarray(vl)  # (epochs, P, 3)
    hist = {}
    for j, k in enumerate(("loss", "r2", "rel")):
        hist[f"train_{k}"] = tl[:, :, j]
        hist[f"val_{k}"] = vl[:, :, j]
    if log_every:
        for ep in range(0, cfg.epochs, log_every):
            log_fn(
                f"epoch {ep}: train mse {tl[ep, :, 0]} | val mse {vl[ep, :, 0]}"
            )
    return params, hist


def _fit_stacked_linear(cfg, X, Y, feat_mask, log_fn=print, seqs=None):
    """Stacked ridge surrogates: P independent closed-form solves on
    host (each is a ~(n_past*D)^2 normal-equation solve — no device
    round trip is worth it), stacked into the same leading-axis params
    pytree the vmapped predictor consumes. History arrays are (1, P)."""
    from .linear import fit_linear

    if Y.shape[2] != cfg.n_future:
        raise ValueError(
            "arch='linear' fits one direct n_past->n_future map; set "
            "rollout_windows = 1"
        )
    Pn, G = X.shape[0], X.shape[1]
    n_train = max(int(cfg.train_portion * G), 1)
    rng = np.random.default_rng(cfg.seed + 1)
    params_l, tl, vl, lams = [], [], [], []
    for r in range(Pn):
        tr = rng.choice(G, size=n_train, replace=False)
        va = np.setdiff1d(np.arange(G), tr)
        p_r, h_r = fit_linear(
            cfg, X[r][tr], Y[r][tr], X[r][va], Y[r][va],
            feat_mask=np.asarray(feat_mask[r]),
            seqs=None if seqs is None else seqs[r],
        )
        lams.append(h_r.get("ridge_lambda", cfg.ridge_lambda))
        params_l.append(p_r)
        tl.append([h_r["train_loss"][0], h_r["train_r2"][0],
                   h_r["train_rel"][0]])
        vl.append([h_r["val_loss"][0], h_r["val_r2"][0],
                   h_r["val_rel"][0]])
    params = jax.tree.map(lambda *xs: jnp.stack(xs), *params_l)
    tl = np.asarray(tl)[None]  # (1, P, 3)
    vl = np.asarray(vl)[None]
    hist = {}
    for j, k in enumerate(("loss", "r2", "rel")):
        hist[f"train_{k}"] = tl[:, :, j]
        hist[f"val_{k}"] = vl[:, :, j]
    log_fn(
        f"ridge fit: train mse {tl[0, :, 0]} | val mse {vl[0, :, 0]}"
        + (f" | lambda {lams}" if seqs is not None else "")
    )
    hist["ridge_lambda"] = np.asarray(lams, np.float64)[None]  # (1, P)
    return params, hist
