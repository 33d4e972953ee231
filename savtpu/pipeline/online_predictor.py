"""Stage 4: the synchronization-avoiding hybrid run.

Equivalent of Online_predictor.py:251-318. Schedule: i_cri+1 = n_p*n_s
synchronized steps (one compiled scan *with* the shared-DOF psum per step),
then repeated blocks of n_f*n_s = 3000 steps compiled with NO collective at
all — each block's shared DOFs come from one batched phase-interleaved LSTM
prediction per rank, fed into the scan as inputs. The outer Python loop
runs ~33 iterations; everything inside is jitted.

Scaling constants are recomputed from the stored training traces exactly
as the reference does (Online_predictor.py:128-136) and cross-checked
against the training sidecar.
"""

from __future__ import annotations

import argparse
import time

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io.artifacts import (
    load_displacement,
    load_params,
    save_displacement,
)
from ..utils.offload import fetch_into
from ..models import (
    init_seq2seq,
    phase_interleaved_predict,
    scale_to_zero_one,
    strided_windows,
)
from .common import StageContext, build_context, rank_trajectory, save_partition_labels


def load_rank_models(ctx: StageContext):
    """Rebuild per-rank surrogates from the stage-3 artifacts
    (call_model, DNN_prediction.py:18-34, without the re-hardcoded
    architecture: it comes from the sidecar)."""
    import jax

    from ..io.artifacts import load_params_meta

    sur = ctx.cfg.surrogate
    models = []
    for r in range(ctx.sp.n_parts):
        mf = ctx.store.model_file(r)
        if not mf.exists():
            raise FileNotFoundError(
                f"rank {r}: no trained surrogate at {mf} — run stage 3 "
                f"(savtpu.pipeline.model_training) first"
            )
        meta = load_params_meta(ctx.store.model_file(r))
        ens = int(meta.get("ensemble", 1) or 1)
        if meta.get("arch", "lstm") == "expfit":
            # host-evaluated Prony surrogate (models/expfit.py): no
            # scaling constants, params stay host-side float64
            from ..models.expfit import init_expfit

            template = init_expfit(
                int(meta["expfit_modes"]), int(meta["input_size"])
            )
            params = load_params(ctx.store.model_file(r), template)
            modal_info = None
            if meta.get("modal_dim"):
                modal_info = (
                    np.asarray(meta["modal_mean"], dtype=np.float64),
                    np.asarray(meta["modal_basis"], dtype=np.float64),
                )
            models.append(
                (params, 0.0, -1.0, int(meta["input_size"]), False,
                 modal_info, 1, meta)
            )
            continue
        if meta.get("arch", "lstm") == "hybrid":
            # expfit base + residual LSTM (pipeline/model_training.py:
            # _run_hybrid): params is a {"expfit", "lstm"} pytree; the
            # scaling constants belong to the RESIDUAL trace
            from ..models.expfit import eval_expfit, init_expfit
            from ..models.modal import to_modal

            template = {
                "expfit": init_expfit(
                    int(meta["expfit_modes"]),
                    int(meta["real_input_size"]),
                ),
                "lstm": init_seq2seq(
                    jax.random.PRNGKey(0),
                    meta["input_size"],
                    meta["hidden_size"],
                    meta["num_layers_encoder"],
                    meta["bidirectional"],
                    dtype=jnp.dtype(sur.dtype),
                    increment=meta.get("target_mode") == "increment",
                ),
            }
            params = load_params(ctx.store.model_file(r), template)
            mu = np.asarray(meta["modal_mean"], dtype=np.float64)
            basis = np.asarray(meta["modal_basis"], dtype=np.float64)
            if sur.arch == "expfit":
                # arch DOWNGRADE: cfg asks for expfit but the stage-3
                # artifacts are hybrid — evaluate only the closed-form
                # base and drop the residual LSTM. Fallback for when the
                # fused hybrid group program cannot run at scale (the
                # in-scan stacked LSTM + residual-history carry at 256
                # parts exceeds what the device/worker survives).
                models.append(
                    (params["expfit"], 0.0, -1.0,
                     int(meta["input_size"]), False, (mu, basis), 1,
                     {**meta, "arch": "expfit"})
                )
                continue
            # cross-check the residual scaling like the raw-trace path:
            # rebuild the residual from the stored trace + sidecar expfit
            from .model_training import effective_filter as _eff

            trace = load_displacement(ctx.store.shared_dof_h5(r)).T
            co = to_modal(trace, mu, basis)
            res = co - eval_expfit(
                params["expfit"], np.arange(len(co), dtype=float),
                float(meta["expfit_ramp_end_row"]),
            )
            X, Y = strided_windows(
                res, sur.n_past,
                sur.n_future * int(meta.get("rollout_windows", 1) or 1),
                _eff(ctx.cfg), sur.cut_off,
            )
            _, _, smax, smin = scale_to_zero_one(
                X, Y, mode=meta.get("scale_mode", "joint")
            )
            meta_max = np.asarray(meta["scale_max"], dtype=np.float64)
            meta_min = np.asarray(meta["scale_min"], dtype=np.float64)
            D_real = X.shape[-1]
            if not np.allclose(
                np.asarray(smax).reshape(-1),
                meta_max.reshape(-1)[:D_real], rtol=1e-10,
            ) or not np.allclose(
                np.asarray(smin).reshape(-1),
                meta_min.reshape(-1)[:D_real], rtol=1e-10,
            ):
                raise ValueError(
                    f"rank {r}: hybrid residual scaling drifted between "
                    f"training and online"
                )
            models.append(
                (
                    params,
                    meta_max if meta_max.ndim else float(meta_max),
                    meta_min if meta_min.ndim else float(meta_min),
                    int(meta["input_size"]),
                    True,
                    (mu, basis),
                    1,
                    meta,
                )
            )
            continue
        if meta.get("arch", "lstm") == "linear":
            from ..models.linear import init_linear

            template = init_linear(
                meta["n_past"], meta["n_future"], meta["input_size"],
                dtype=jnp.dtype(sur.dtype),
            )
        else:
            def _init(k):
                return init_seq2seq(
                    k,
                    meta["input_size"],
                    meta["hidden_size"],
                    meta["num_layers_encoder"],
                    meta["bidirectional"],
                    dtype=jnp.dtype(sur.dtype),
                    increment=meta.get("target_mode") == "increment",
                )

            if ens > 1:
                # seed-ensemble sidecar: every leaf has a leading (E,)
                # member axis (SurrogateConfig.ensemble)
                template = jax.vmap(_init)(
                    jax.random.split(jax.random.PRNGKey(0), ens)
                )
            else:
                template = _init(jax.random.PRNGKey(0))
        params = load_params(ctx.store.model_file(r), template)

        # recompute the scaling constants from the stored trace, like the
        # reference; cross-check against the sidecar values.
        from .model_training import effective_filter

        trace = load_displacement(ctx.store.shared_dof_h5(r)).T
        modal_info = None
        if meta.get("modal_dim"):
            from ..models.modal import to_modal

            mu = np.asarray(meta["modal_mean"], dtype=np.float64)
            basis = np.asarray(meta["modal_basis"], dtype=np.float64)
            modal_info = (mu, basis)
            trace = to_modal(trace, mu, basis)
        X, Y = strided_windows(
            trace, sur.n_past,
            sur.n_future * int(meta.get("rollout_windows", 1) or 1),
            effective_filter(ctx.cfg), sur.cut_off,
        )
        scale_mode = meta.get("scale_mode", "joint")
        _, _, smax, smin = scale_to_zero_one(X, Y, mode=scale_mode)
        meta_max = np.asarray(meta["scale_max"], dtype=np.float64)
        meta_min = np.asarray(meta["scale_min"], dtype=np.float64)
        D_real = X.shape[-1]
        if not np.allclose(
            np.asarray(smax).reshape(-1),
            meta_max.reshape(-1)[:D_real], rtol=1e-10,
        ) or not np.allclose(
            np.asarray(smin).reshape(-1),
            meta_min.reshape(-1)[:D_real], rtol=1e-10,
        ):
            raise ValueError(
                f"rank {r}: scaling constants drifted between training "
                f"and online (mode={scale_mode})"
            )
        models.append(
            (
                params,
                meta_max if meta_max.ndim else float(meta_max),
                meta_min if meta_min.ndim else float(meta_min),
                int(meta["input_size"]),
                bool(meta.get("padded_input", False)),
                modal_info,
                ens,
                meta,
            )
        )
    return models


def smooth_preds(preds, hist_tail, win):
    """Centered moving average (window ``win``) of the predicted block
    along time, continued from the recorded history at the block's front
    edge and reflect-padded at the back.

    The phase-interleaved block's rows come from ``filter_size``
    INDEPENDENT models, so row-to-row jitter above the coarse-grid
    Nyquist 1/(filter_size*dt) is pure interleave noise — the models
    only ever see filter_size-strided samples and cannot represent that
    band — while the solver's near-undamped modes amplify it resonantly
    (scripts/noise_amplification.py). Averaging over ~one stride keeps
    everything the surrogate can actually predict."""
    import jax.numpy as jnp

    if int(win) <= 1:          # win=1 is the identity, not a 3-wide MA
        return preds
    h = max(1, int(win) // 2)
    w = 2 * h + 1
    front = hist_tail[:, -h:, :].astype(preds.dtype)
    back = preds[:, ::-1][:, :h, :]
    ext = jnp.concatenate([front, preds, back], axis=1)
    cs = jnp.cumsum(ext, axis=1)
    cs = jnp.concatenate([jnp.zeros_like(cs[:, :1]), cs], axis=1)
    return (cs[:, w:] - cs[:, :-w]) / w


def owner_counts(sgi, smask, SD) -> np.ndarray:
    """(SD,) number of owner ranks of each global shared DOF (host)."""
    cnt = np.zeros(SD)
    np.add.at(cnt, np.asarray(sgi).reshape(-1), np.asarray(smask).reshape(-1))
    return np.maximum(cnt, 1.0)


def prediction_consensus(preds, sgi, smask, SD, cnt=None,
                         reduce_fn=lambda x: x):
    """Average every owner rank's prediction of each duplicated shared DOF
    (savtpu extension; see SurrogateConfig.pred_consensus). preds
    (P, T, 3*S_max) -> same shape with all owners of a global shared DOF
    holding the identical (mean) value. Exact rows are a fixed point, so
    the perfect-prediction identity is preserved.

    Mesh-aware: inside ``shard_map`` the local block holds only this
    device's parts, so pass ``reduce_fn = psum`` over the shard axis and
    the precomputed global ``cnt = owner_counts(...)`` (host-side index
    math is impossible on traced sgi)."""
    import jax.numpy as jnp

    P, T, S3 = preds.shape
    flat_idx = jnp.asarray(sgi).reshape(-1)
    flat_mask = jnp.asarray(smask).reshape(-1)
    pr = jnp.moveaxis(jnp.asarray(preds), 0, 1).reshape(T, P * S3)
    num = jnp.zeros((T, SD), pr.dtype).at[:, flat_idx].add(
        pr * flat_mask
    )
    num = reduce_fn(num)
    if cnt is None:
        cnt = owner_counts(sgi, smask, SD)
    avg = num / jnp.asarray(cnt, pr.dtype)
    out = avg[:, flat_idx].reshape(T, P, S3)
    return jnp.moveaxis(out, 0, 1)


def anchor_block(sp, carry, preds):
    """``pred_anchor`` outside the fused runner (ragged tail, resync and
    per-rank fallback paths): one exchanged step from the current carry,
    de-bias the predicted block by the step-0 shared-row discrepancy."""
    d0b, dnb, tb = carry
    F = sp._exchange(sp._fint_stacked(d0b), lambda x: x)
    d1 = sp._update(d0b, dnb, tb, F)
    delta = (sp._gather_shared(d1) - preds[:, 0, :]) * sp.smask
    return preds + delta[:, None, :]


def modal_predict_stacked(sparams, hist, smaxv, sminv, sur, modal,
                          fmaskv, ens: int = 1):
    """Stacked phase-interleaved block prediction with optional modal
    projection: physical history (P, W, S3) -> physical block (P, T, S3).
    ``modal`` is None or (mu (P,S3), basis (P,K,S3), coef_mask (P,K)).
    ``ens > 1``: param leaves carry a member axis at position 1
    ((P, E, ...)); member predictions are averaged (the per-rank scaling
    is affine, so averaging scaled outputs equals averaging raw ones)."""
    import jax
    import jax.numpy as jnp

    from ..models.predictor import phase_interleaved_predict_stacked

    def _pred(params, h, fm):
        if ens <= 1:
            return phase_interleaved_predict_stacked(
                params, h, smaxv, sminv,
                sur.n_past, sur.n_future, sur.filter_size, feat_mask=fm,
            )
        outs = jax.vmap(
            lambda p: phase_interleaved_predict_stacked(
                p, h, smaxv, sminv,
                sur.n_past, sur.n_future, sur.filter_size, feat_mask=fm,
            ),
            in_axes=1,
        )(params)
        return jnp.mean(outs, axis=0)

    if modal is None:
        return _pred(sparams, hist, fmaskv)

    # HIGHEST precision on the projection matmuls: the reconstruction
    # feeds the online loop back, and the MXU's default bf16 passes are
    # what destabilized the linear surrogate (models/linear.py:
    # linear_predict docstring)
    _hi = jax.lax.Precision.HIGHEST
    mu, basis, fmc = modal
    histc = jnp.einsum(
        "pwd,pkd->pwk", hist - mu[:, None, :].astype(hist.dtype),
        basis.astype(hist.dtype), precision=_hi,
    )
    coefs = _pred(sparams, histc, fmc)
    out = (
        jnp.einsum(
            "ptk,pkd->ptd", coefs, basis.astype(coefs.dtype),
            precision=_hi,
        )
        + mu[:, None, :].astype(coefs.dtype)
    )
    return out * fmaskv[:, None, :].astype(out.dtype)


def modal_reconstruct(coefs, modal, fmaskv):
    """(P, T, K) mode coefficients -> (P, T, S3) physical shared rows
    (``modal`` as in modal_predict_stacked; None = coefs are already
    physical, padded to S3)."""
    import jax
    import jax.numpy as jnp

    if modal is None:
        out = coefs
    else:
        mu, basis, _ = modal
        out = (
            jnp.einsum(
                "ptk,pkd->ptd", coefs, basis.astype(coefs.dtype),
                precision=jax.lax.Precision.HIGHEST,
            )
            + mu[:, None, :].astype(coefs.dtype)
        )
    return out * fmaskv[:, None, :].astype(out.dtype)


def make_block_group_runner(solver, sur, *, block, se_run, state_dtype, W,
                            modal=None, ens: int = 1,
                            expfit: bool = False, hybrid: bool = False,
                            efstat=None):
    """Build the fused block-group executor: ``nb`` blocks of the online
    schedule — phase-interleaved prediction, owner consensus, the
    comm-free ``block``-step scan, and the history roll — as ONE compiled
    dispatch, cached per ``nb``.

    Under a device mesh the whole group function runs inside ``shard_map``
    (VERDICT r2 #4): each device holds its parts' solver data, surrogate
    params and history window; the comm-free scan has no collective, and
    the only cross-shard op is the once-per-block owner-consensus psum
    (absent when ``sur.pred_consensus`` is off). With ``mesh=None`` the
    same body runs vmap-emulated under plain jit."""
    import jax
    from functools import partial as _partial

    from ..models.predictor import phase_interleaved_predict_stacked

    sp = solver.sp
    consensus_on = bool(sur.pred_consensus)
    anchor_on = bool(getattr(sur, "pred_anchor", False))
    cnt_global = jnp.asarray(
        owner_counts(sp.sgi, sp.smask, sp.SD), dtype=state_dtype
    )

    def block_group_body(data, d0c, dnc, tc, hist, sparams, smaxv,
                         sminv, fmaskv, cnt, mavs, efs, coefs, nb,
                         reduce_fn):
        lsp = solver._local_view(data)

        def one_block(c, xs):
            d0b, dnb, tb, hist = c
            base = None
            if expfit or hybrid:
                # the block's mode coefficients are evaluated CLOSED-FORM
                # ON DEVICE from the advanced-amplitude pack riding in as
                # scan inputs (models/expfit.py eval_expfit_device): the
                # absolute advance z^{r0} was folded on host in f64, so
                # the in-scan f32 evaluation only sees in-block row
                # offsets (<~60 rows, ~1e-6 relative). This replaces the
                # per-step coefficient feed — a ~400 MB H2D per group at
                # 256 parts over the remote device link (VERDICT r4 #4).
                from ..models.expfit import eval_expfit_device

                co = eval_expfit_device(
                    xs, efs[0], efs[1], efs[2], block
                )
            if expfit:
                # arch="expfit": open loop in time, the history window
                # feeds only smooth_preds' front pad
                blockpred = modal_reconstruct(
                    co, mavs if mavs else None, fmaskv
                )
            elif hybrid:
                # arch="hybrid": open-loop expfit base + the stacked
                # LSTM's RESIDUAL prediction. ``hist`` holds the residual
                # history (physical shared rows minus the base), so the
                # LSTM's modal projection must not re-subtract the mean —
                # mu lives in the base.
                base = modal_reconstruct(co, mavs if mavs else None,
                                         fmaskv)
                mz = (
                    (jnp.zeros_like(mavs[0]), mavs[1], mavs[2])
                    if mavs else None
                )
                resid = modal_predict_stacked(
                    sparams, hist, smaxv, sminv, sur, mz, fmaskv, ens=ens,
                )
                blockpred = base + resid.astype(base.dtype)
            else:
                blockpred = modal_predict_stacked(
                    sparams, hist, smaxv, sminv, sur,
                    mavs if mavs else None, fmaskv, ens=ens,
                )
            preds = blockpred.astype(state_dtype)
            if consensus_on:
                preds = prediction_consensus(
                    preds, lsp.sgi, lsp.smask, sp.SD,
                    cnt=cnt, reduce_fn=reduce_fn,
                )
            if sur.pred_smooth:
                preds = smooth_preds(
                    preds, hist.astype(state_dtype), sur.pred_smooth
                )
            if anchor_on:
                # per-block exchanged anchoring (SurrogateConfig.
                # pred_anchor): one exchanged step from the current state
                # gives the true interface response; de-bias the whole
                # block by the step-0 discrepancy. One psum per block.
                F_a = lsp._exchange(lsp._fint_stacked(d0b), reduce_fn)
                d1a = lsp._update(d0b, dnb, tb, F_a)
                delta = (
                    lsp._gather_shared(d1a) - preds[:, 0, :]
                ) * lsp.smask
                preds = preds + delta[:, None, :]
            (traj_b, shared_b), (d1, dprev, t1) = lsp.stacked_run(
                d0b, dnb, tb, block, sync=False, preds=preds,
                record="all", save_every=se_run,
            )
            roll = (
                shared_b - base.astype(shared_b.dtype)
                if hybrid else shared_b
            )
            hist = jnp.concatenate(
                [hist, roll.astype(hist.dtype)], axis=1
            )[:, -W:]
            return (d1, dprev, t1, hist), traj_b

        (d0c, dnc, tc, hist), trajs = jax.lax.scan(
            one_block, (d0c, dnc, tc, hist),
            coefs if (expfit or hybrid) else None, length=nb,
        )
        return (d0c, dnc, tc), hist, trajs

    _bg_cache = {}

    def run_block_group(data, d0c, dnc, tc, hist, sparams, smaxv,
                        sminv, fmaskv, nb, coefs=None):
        fn = _bg_cache.get(nb)
        if fn is None:
            if solver.mesh is None:
                fn = jax.jit(
                    _partial(block_group_body, nb=nb,
                             reduce_fn=lambda x: x)
                )
            else:
                from jax.sharding import PartitionSpec as _P

                try:
                    from jax import shard_map as _smap
                except ImportError:  # pragma: no cover
                    from jax.experimental.shard_map import (
                        shard_map as _smap,
                    )

                from ..parallel.sharded import AXIS

                shard = _P(AXIS)
                local = _partial(
                    block_group_body, nb=nb,
                    reduce_fn=lambda x: jax.lax.psum(x, AXIS),
                )
                data_specs = {k: shard for k in data}
                fn = jax.jit(_smap(
                    local,
                    mesh=solver.mesh,
                    # coefs: advanced-amplitude pack, leaves
                    # (nb, P, ...) — scan axis replicated, parts
                    # sharded (empty pytree when not expfit; the
                    # params placeholder is then an unsharded scalar).
                    # efs: static pole pack, leaves (P, ...) sharded.
                    in_specs=(data_specs, shard, shard, _P(), shard,
                              _P() if expfit else shard,
                              shard, shard, shard, _P(), shard, shard,
                              _P(None, AXIS)),
                    out_specs=((shard, shard, _P()), shard,
                               _P(None, AXIS)),
                    check_vma=False,
                ))
            _bg_cache[nb] = fn
        return fn(data, d0c, dnc, tc, hist, sparams, smaxv, sminv,
                  fmaskv, cnt_global, tuple(modal) if modal else (),
                  tuple(efstat) if efstat else (),
                  coefs if (expfit or hybrid) else ())

    return run_block_group


def run(cfg: Config, ctx: StageContext | None = None, verbose: bool = True,
        resume: bool = True):
    if ctx is None:
        ctx = build_context(cfg)
    prob, sp, solver, store, maps = (
        ctx.prob, ctx.sp, ctx.solver, ctx.store, ctx.maps,
    )
    sur = cfg.surrogate
    save_partition_labels(ctx)
    models = load_rank_models(ctx)

    num_steps = cfg.solver.num_steps
    # runs shorter than the warm-up are simply all-synchronized (the
    # reference's loop syncs while i <= i_cri, Online_predictor.py:253)
    n_sync = min(sur.i_cri + 1, num_steps)  # 3000 synchronized steps
    block = sur.block_size          # 3000-step comm-free refill blocks
    P = sp.n_parts
    S3 = sp.sld.shape[1]
    state_dtype = sp.lM.dtype

    if verbose:
        print(
            f"[online] {n_sync} synced + {num_steps - n_sync} comm-free "
            f"steps in blocks of {block} ({P} parts)"
        )

    # stacked fast path: all models padded to the same width -> one
    # vmapped predictor call per block, shared history device-resident.
    # With modal_dim the models consume/emit K mode coefficients; the
    # projection to/from physical shared rows happens around the predictor
    # (SurrogateConfig.modal_dim).
    modal_on = P > 0 and all(m[5] is not None for m in models)
    some_modal = any(m[5] is not None for m in models)
    ens_set = {m[6] for m in models}
    if len(ens_set) > 1:
        raise ValueError(f"mixed ensemble sizes across ranks: {ens_set}")
    ens_m = ens_set.pop() if ens_set else 1
    archs = {(m[7] or {}).get("arch", "lstm") for m in models}
    expfit_on = archs == {"expfit"}
    hybrid_on = archs == {"hybrid"}
    if ("expfit" in archs and not expfit_on) or (
        "hybrid" in archs and not hybrid_on
    ):
        raise ValueError(f"mixed surrogate arches across ranks: {archs}")
    if hybrid_on and sur.pred_smooth:
        raise ValueError(
            "pred_smooth is not supported with arch='hybrid' (the "
            "history window holds residual rows; the modal basis is "
            "already a spatial band-limit)"
        )
    if expfit_on:
        # host-evaluated open-loop surrogate: always the stacked fused
        # path; uniform K required only in modal mode (raw channels are
        # padded to S3 below)
        stacked_ok = (not modal_on) or len({m[3] for m in models}) == 1
    elif modal_on:
        stacked_ok = (
            all(m[4] for m in models)
            and len({m[3] for m in models}) == 1
        )
    else:
        stacked_ok = (
            not some_modal
            and all(m[4] and m[3] == S3 for m in models)
            and P > 0
        )
    modal_pack = None
    if stacked_ok:
        import jax

        if expfit_on:
            # params stay on host (coefficients are pre-evaluated there);
            # the runner gets inert placeholders
            stacked_params = 0.0
            smax_v = jnp.zeros((P,), dtype=jnp.dtype(sur.dtype))
            smin_v = jnp.zeros((P,), dtype=jnp.dtype(sur.dtype))
        else:
            stacked_params = jax.tree.map(
                lambda *xs: jnp.stack(xs),
                *[m[0]["lstm"] if hybrid_on else m[0] for m in models],
            )
            smax_v = jnp.asarray(
                [m[1] for m in models], dtype=jnp.dtype(sur.dtype)
            )
            smin_v = jnp.asarray(
                [m[2] for m in models], dtype=jnp.dtype(sur.dtype)
            )
        fmask_v = np.zeros((P, S3), dtype=np.float32)
        for r in range(P):
            fmask_v[r, : 3 * len(maps.shared_nodes[r])] = 1.0
        fmask_v = jnp.asarray(fmask_v, dtype=jnp.dtype(sur.dtype))
        if modal_on:
            K = models[0][3]
            mu_np = np.zeros((P, S3))
            basis_np = np.zeros((P, K, S3))
            fmc = np.zeros((P, K), np.float32)
            for r, m in enumerate(models):
                mu, basis = m[5]
                Dr = mu.shape[0]
                mu_np[r, :Dr] = mu
                basis_np[r, : basis.shape[0], :Dr] = basis
                fmc[r, : basis.shape[0]] = 1.0
            dt_ = jnp.dtype(sur.dtype)
            modal_pack = (
                jnp.asarray(mu_np, dt_),
                jnp.asarray(basis_np, dt_),
                jnp.asarray(fmc, dt_),
            )

    # arch="expfit": the model is a closed-form function of time, so the
    # fused block groups evaluate it ON DEVICE (models/expfit.py
    # eval_expfit_device) from tiny advanced-amplitude packs built here
    # per group in f64 — the old per-step coefficient feed materialized
    # (P, T_pred, K) on host (~3 GB at 256 parts) and shipped ~400 MB of
    # H2D per group over the remote device link (VERDICT r4 #4).
    base_hist = None  # hybrid: physical base at the warm-up history rows
    ef_static = None
    if expfit_on or hybrid_on:
        from ..models.expfit import advance_expfit, eval_expfit

        if hybrid_on and not stacked_ok:
            raise ValueError(
                "arch='hybrid' requires the stacked online path "
                "(uniform modal_dim across ranks)"
            )
        Kfeed = models[0][3] if modal_on else S3
        n_modes_max = max(
            len((m[0]["expfit"] if hybrid_on else m[0])["z_re"])
            for m in models
        )
        if not modal_on and P * S3 * (4 * n_modes_max + 4) * 4 > 500e6:
            raise ValueError(
                "arch='expfit' without modal_dim would ship "
                f"{P}x{S3}x{n_modes_max} amplitude packs per block; set "
                "surrogate.modal_dim (e.g. 16) to feed mode "
                "coefficients instead"
            )
        W_h = sur.n_past * sur.filter_size
        if hybrid_on:
            base_hist = np.zeros((P, W_h, S3))
        ef_models = []  # (params, save_every, ramp_end_row) per rank
        for r, m in enumerate(models):
            meta_r = m[7]
            pr = m[0]["expfit"] if hybrid_on else m[0]
            se_r = float(meta_r.get("save_every", 1) or 1)
            ramp_r = float(meta_r["expfit_ramp_end_row"])
            ef_models.append((pr, se_r, ramp_r))
            if hybrid_on:
                hrows = (
                    np.arange(n_sync - W_h, n_sync, dtype=np.float64)
                    / se_r
                )
                ch = eval_expfit(pr, hrows, ramp_r)
                mu_r, basis_r = m[5]
                base_hist[r, :, : mu_r.shape[0]] = ch @ basis_r + mu_r

        # static device pack: per-rank poles (padded with a decayed
        # dummy z=0.5 whose amplitudes are zero) + row stride
        M_max = max(
            (len(p["z_re"]) for p, _, _ in ef_models), default=1
        ) or 1
        z_re_np = np.full((P, M_max), 0.5)
        z_im_np = np.zeros((P, M_max))
        se_np = np.ones((P,))
        for r, (p, se_r, _) in enumerate(ef_models):
            mr = len(p["z_re"])
            z_re_np[r, :mr] = p["z_re"]
            z_im_np[r, :mr] = p["z_im"]
            se_np[r] = se_r
        ef_static = (
            jnp.asarray(z_re_np, jnp.float32),
            jnp.asarray(z_im_np, jnp.float32),
            jnp.asarray(se_np, jnp.float32),
        )

        def expfit_group_pack(b0: int, nb: int):
            """Advanced-amplitude packs for blocks [b0, b0+nb): f32
            leaves (nb, P, Kfeed[, M_max]) — a few MB per group."""
            pk = {
                "constA": np.zeros((nb, P, Kfeed), np.float32),
                "linA": np.zeros((nb, P, Kfeed), np.float32),
                "aA_re": np.zeros((nb, P, Kfeed, M_max), np.float32),
                "aA_im": np.zeros((nb, P, Kfeed, M_max), np.float32),
                "constB": np.zeros((nb, P, Kfeed), np.float32),
                "aB_re": np.zeros((nb, P, Kfeed, M_max), np.float32),
                "aB_im": np.zeros((nb, P, Kfeed, M_max), np.float32),
                "gap": np.zeros((nb, P), np.float32),
            }
            for j in range(nb):
                step0 = n_sync + (b0 + j) * block
                for r, (p, se_r, ramp_r) in enumerate(ef_models):
                    adv = advance_expfit(p, step0 / se_r, ramp_r)
                    C_r = adv["constA"].shape[0]
                    mr = adv["aA_re"].shape[1]
                    pk["constA"][j, r, :C_r] = adv["constA"]
                    pk["linA"][j, r, :C_r] = adv["linA"]
                    pk["aA_re"][j, r, :C_r, :mr] = adv["aA_re"]
                    pk["aA_im"][j, r, :C_r, :mr] = adv["aA_im"]
                    pk["constB"][j, r, :C_r] = adv["constB"]
                    pk["aB_re"][j, r, :C_r, :mr] = adv["aB_re"]
                    pk["aB_im"][j, r, :C_r, :mr] = adv["aB_im"]
                    pk["gap"][j, r] = adv["gap"]
            return {k: jnp.asarray(v) for k, v in pk.items()}

        def expfit_block_preds(b0: int, n: int) -> np.ndarray:
            """Physical (P, n, S3) predictions for steps
            [n_sync + b0*block, n_sync + b0*block + n) — host f64
            reconstruction for the resync / ragged-tail paths."""
            steps = np.arange(
                n_sync + b0 * block, n_sync + b0 * block + n,
                dtype=np.float64,
            )
            out = np.zeros((P, n, S3))
            for r, m in enumerate(models):
                pr, se_r, ramp_r = ef_models[r]
                co = eval_expfit(pr, steps / se_r, ramp_r)
                if modal_on:
                    mu, basis = m[5]
                    out[r, :, : mu.shape[0]] = (
                        co[:, : basis.shape[0]] @ basis + mu
                    )
                else:
                    out[r, :, : co.shape[1]] = co
            return out

    # shared-DOF history — feeds the predictor. The stacked fast path only
    # ever reads the trailing W = n_past*filter_size rows, so it keeps a
    # device-resident rolling window (no per-block device<->host transfer
    # of the shared trace); the per-rank fallback keeps the full host
    # history.
    W = sur.n_past * sur.filter_size
    shared_hist = None
    if not stacked_ok:
        shared_hist = np.zeros((P, num_steps, S3))
        ignored = [
            k for k, v in (
                ("pred_smooth", sur.pred_smooth),
                ("resync_blocks", getattr(sur, "resync_blocks", 0)),
            ) if v
        ]
        if ignored and verbose:
            print(
                "[online] WARNING: per-rank fallback path ignores "
                + ", ".join(ignored)
                + " (only honored on the stacked fast path)"
            )

    # in-scan save_every stride when every scan segment length divides
    # evenly (the reference schedule always does: n_sync = n_p*n_s and
    # block = n_f*n_s); otherwise record full-res and stride on host.
    se = cfg.solver.save_every
    se_run = (
        se
        if (num_steps % se == 0 and n_sync % se == 0 and block % se == 0)
        else 1
    )

    # recorded trajectory buffer: every segment (warm-up, block groups,
    # resync blocks, ragged tail, fallback blocks) writes in order at
    # rec_off. With cfg.solver.ckpt_every the buffer is a disk-backed
    # memmap plus a carry/history state file saved at group boundaries, so
    # a killed stage-4 run resumes bit-exactly (stacked path only).
    n_rec_total = num_steps // se_run
    use_ckpt = bool(cfg.solver.ckpt_every) and stacked_ok
    tstore = None
    ck_extras = {}
    start_steps = 0
    if use_ckpt:
        from ..utils.checkpoint import TrajStore

        tstore = TrajStore(
            store.ckpt_dir("stage4"), P, sp.DL, S3, n_rec_total, W,
            state_dtype, True, True,  # "shared" slot holds the W-window
        )
        ck_expect = {
            "num_steps": num_steps, "save_every": se_run, "P": P,
            "DL": sp.DL, "n_sync": n_sync, "block": block,
        }
        start_steps, ck_extras = tstore.resume_step(ck_expect, resume)
        tstore.open(fresh=start_steps == 0)
        traj_full = tstore.mm["traj"]
    else:
        traj_full = np.empty(
            (P, n_rec_total, sp.DL), dtype=np.dtype(state_dtype)
        )

    rec_off = 0
    # stage-4 wall breakdown (logged at the end): where the gap between
    # the kernel floor and end-to-end wall goes (VERDICT r3 #3) —
    # fetch_s counts blocking D2H+compute waits in np.asarray of device
    # segments, write_s the host memmap/array stores.
    tprof = {"fetch_s": 0.0, "write_s": 0.0, "warmup_s": 0.0,
             "first_group_s": 0.0}

    def write_seg(arr):
        # threaded-chunk D2H straight into the (memmap) destination: the
        # remote link is stream-limited (~14 MB/s bulk vs ~40 MB/s at 16
        # concurrent slice fetches — utils/offload.py). fetch_s counts
        # the whole interleaved fetch+write wall; write_s keeps only the
        # host-side writes that are NOT overlapped with a fetch.
        nonlocal rec_off
        n = arr.shape[1]
        t0 = time.perf_counter()
        fetch_into(traj_full[:, rec_off : rec_off + n], arr)
        tprof["fetch_s"] += time.perf_counter() - t0
        rec_off += n

    # Double-buffered offload: the group loop dispatches group k+1 BEFORE
    # fetching group k's stacked trajectory, so the D2H copy (hundreds of
    # MB per group at 384^3/256, and a first-class cost over a remote
    # device link) overlaps the next group's device compute. `pending`
    # holds at most one group's device-side output; every ordered writer
    # (resync blocks, ragged tail, checkpoints) flushes first so segments
    # land in `traj_full` in step order.
    pending = None

    def flush_pending():
        nonlocal pending
        if pending is not None:
            write_seg(pending)
            pending = None

    ctx.join_warm()  # don't let a stalled first D2H fetch skew the timing
    t_start = time.perf_counter()
    if start_steps:
        import jax

        if verbose:
            print(f"[online] resuming at step {start_steps}/{num_steps}")
        rec_off = start_steps // se_run
        carry = (
            jnp.asarray(ck_extras["d0"], state_dtype),
            jnp.asarray(ck_extras["dn"], state_dtype),
            jnp.asarray(float(ck_extras["tn"])),
        )
        shared0 = np.asarray(tstore.mm["shared"])  # trailing W window
    else:
        d0 = sp.localize(prob.d0)
        dn = sp.localize(prob.dn)
        _tw = time.perf_counter()
        (traj0, shared0), carry = solver.run_streamed(
            d0, dn, 0.0, n_sync, sync=True, record="all",
            save_every=se_run,
        )
        tprof["warmup_s"] = time.perf_counter() - _tw
        if shared_hist is not None:
            shared_hist[:, :n_sync] = shared0
        write_seg(traj0)
        shared0 = shared0[:, -W:]

    if stacked_ok:
        import jax
        from functools import partial as _partial

        from ..models.predictor import phase_interleaved_predict_stacked

        # device-resident trailing history window (one H2D at start);
        # arch="hybrid" keeps the RESIDUAL history (measured rows minus
        # the expfit base — post-warm-up it becomes the residual LSTM's
        # own feedback, matching its training signal)
        h0 = np.asarray(shared0[:, -W:], dtype=np.float64)
        if hybrid_on and not start_steps:
            h0 = h0 - base_hist
        hd_dt = (
            jnp.dtype(sur.hist_dtype)
            if getattr(sur, "hist_dtype", None) else jnp.dtype(sur.dtype)
        )
        hist_dev = jnp.asarray(h0, dtype=hd_dt)

        # The whole block pipeline — phase-interleaved prediction,
        # owner consensus, the comm-free 3000-step scan, and the history
        # roll — is ONE jitted function scanned over groups of blocks:
        # one device dispatch per group instead of ~4 per block (the
        # per-dispatch round trip dominates stage-4 wall time over a
        # remote device link). Group size is bounded so a single dispatch
        # stays well under remote-worker watchdogs. Per-part tensors ride
        # as arguments via solver._data() (never HLO constants).
        sp_data = solver._data()
        run_block_group = make_block_group_runner(
            solver, sur, block=block, se_run=se_run,
            state_dtype=state_dtype, W=W, modal=modal_pack, ens=ens_m,
            expfit=expfit_on, hybrid=hybrid_on, efstat=ef_static,
        )

        full_blocks = (num_steps - n_sync) // block
        resync = int(getattr(sur, "resync_blocks", 0) or 0)
        # group size bounded by what the group scan actually STACKS and
        # the host then fetches: only the save_every-strided trajectory
        # (nb, P, block/se, DL) — the per-block shared rows and pred
        # buffers are consumed inside each scan iteration and their HBM
        # is reused across blocks. The budget caps the end-of-group
        # fetch at ~750 MB (a ~1GB single fetch crashed the remote
        # worker at 64 parts x 1912 DL with se_run=1, which this bound
        # still keeps at GROUP=1).
        per_block_bytes = 4 * P * (block // max(se_run, 1)) * sp.DL
        # 500 MB per group: with the double-buffered offload two groups'
        # stacked outputs can be live at once, so the cap keeps the
        # transient under the ~1 GB that crashed the remote worker.
        GROUP = max(1, min(8, int(500_000_000 // max(per_block_bytes, 1))))
        if resync:
            GROUP = min(GROUP, resync)
        done_blocks = int(ck_extras.get("done_blocks", 0))
        n_resync_steps = int(ck_extras.get("n_resync_steps", 0))
        since_resync = int(ck_extras.get("since_resync", 0))

        def save_ckpt():
            if tstore is None:
                return
            flush_pending()  # resume replays from written trajectory only
            tstore.mm["shared"][:] = np.asarray(
                hist_dev, dtype=np.dtype(state_dtype)
            )
            tstore.save_state(
                carry, n_sync + done_blocks * block, ck_expect,
                extras={
                    "done_blocks": done_blocks,
                    "n_resync_steps": n_resync_steps,
                    "since_resync": since_resync,
                },
            )

        if use_ckpt and not start_steps:
            save_ckpt()  # warm-up completed
        # Checkpoint on the ckpt_every STEP cadence, not every group:
        # save_ckpt's flush_pending() synchronously fetches the
        # just-dispatched group, so a per-group save would zero out the
        # double-buffered D2H/compute overlap in exactly the long runs
        # checkpointing targets (ADVICE r3). Group boundaries are the only
        # legal save points, so the cadence rounds up to whole groups.
        ckpt_blocks = int(ck_extras.get("done_blocks", done_blocks))
        ckpt_stride = max(1, -(-int(cfg.solver.ckpt_every or block) // block))
        while done_blocks < full_blocks:
            nb = min(GROUP, full_blocks - done_blocks)
            if resync:
                nb = min(nb, resync - since_resync)
            d0c, dnc, tc = carry
            coefs_g = None
            if expfit_on or hybrid_on:
                coefs_g = expfit_group_pack(done_blocks, nb)
            _tg = time.perf_counter()
            carry, hist_dev, trajs_g = run_block_group(
                sp_data, d0c, dnc, tc, hist_dev, stacked_params,
                smax_v, smin_v, fmask_v, nb, coefs=coefs_g,
            )
            if not tprof["first_group_s"]:
                # first dispatch blocks on tracing + (remote) compilation
                # of the group program; later dispatches are async
                import jax as _jax

                _jax.block_until_ready(carry)
                tprof["first_group_s"] = time.perf_counter() - _tg
            # (nb, P, block//se, DL) -> (P, nb*block//se, DL); offload to
            # host per group so device memory and the final fetch stay
            # bounded at large P*DL (one ~1GB end-of-run fetch crashed the
            # remote worker at 64 parts x 1912 DL). The fetch is deferred
            # one iteration: the PREVIOUS group's copy runs while this
            # group computes (run_block_group dispatch is async).
            tg = jnp.moveaxis(trajs_g, 0, 1)
            flush_pending()
            pending = tg.reshape(P, -1, tg.shape[-1])
            done_blocks += nb
            since_resync += nb
            if (
                resync
                and since_resync >= resync
                and done_blocks < full_blocks
            ):
                # periodic re-synchronization: one exchanged block that
                # BLENDS the shared DOFs from the prediction (w=0) to the
                # computed dynamics (w=1) over the block. A hard release
                # rings: the interface layer stores elastic energy
                # proportional to the prescribed-boundary error, and
                # freeing it impulsively excites undamped modes that
                # compound exponentially across resync cycles (measured:
                # x10-30 amplitude per hard-resync block). The smoothstep
                # ramp releases it quasi-statically and re-anchors the
                # prediction history to real dynamics.
                base_s = None
                if expfit_on:
                    blockpred = jnp.asarray(
                        expfit_block_preds(done_blocks, block)
                    )
                elif hybrid_on:
                    base_s = jnp.asarray(
                        expfit_block_preds(done_blocks, block)
                    )
                    mz = (jnp.zeros_like(modal_pack[0]), modal_pack[1],
                          modal_pack[2])
                    blockpred = base_s + modal_predict_stacked(
                        stacked_params, hist_dev, smax_v, smin_v, sur,
                        mz, fmask_v, ens=ens_m,
                    ).astype(base_s.dtype)
                else:
                    blockpred = modal_predict_stacked(
                        stacked_params, hist_dev, smax_v, smin_v, sur,
                        modal_pack, fmask_v, ens=ens_m,
                    )
                preds_s = blockpred.astype(state_dtype)
                if sur.pred_consensus:
                    preds_s = prediction_consensus(
                        preds_s, sp.sgi, sp.smask, sp.SD
                    )
                if sur.pred_smooth:
                    preds_s = smooth_preds(
                        preds_s, hist_dev.astype(state_dtype),
                        sur.pred_smooth,
                    )
                tt = jnp.linspace(0.0, 1.0, block, dtype=state_dtype)
                wramp = tt * tt * (3.0 - 2.0 * tt)
                d0c, dnc, tc = carry
                (traj_s, shared_s), carry = solver.run(
                    d0c, dnc, tc, block, sync=True, preds=preds_s,
                    blend=wramp, record="all", save_every=se_run,
                )
                roll_s = jnp.asarray(shared_s)
                if hybrid_on:
                    roll_s = roll_s - base_s.astype(roll_s.dtype)
                hist_dev = jnp.concatenate(
                    [hist_dev, roll_s.astype(hist_dev.dtype)],
                    axis=1,
                )[:, -W:]
                flush_pending()
                write_seg(traj_s)
                done_blocks += 1
                n_resync_steps += block
                since_resync = 0
            if done_blocks - ckpt_blocks >= ckpt_stride:
                save_ckpt()
                ckpt_blocks = done_blocks
            if verbose:
                print(
                    f"[online] step {n_sync + done_blocks * block}"
                    f"/{num_steps}"
                )
        flush_pending()
        i = n_sync + full_blocks * block

        if stacked_ok and i < num_steps:
            # ragged tail (< one block): single fused-block call
            n = num_steps - i
            if expfit_on:
                blockpred = jnp.asarray(
                    expfit_block_preds(full_blocks, n)
                )
            elif hybrid_on:
                base_t = jnp.asarray(expfit_block_preds(full_blocks, n))
                mz = (jnp.zeros_like(modal_pack[0]), modal_pack[1],
                      modal_pack[2])
                blockpred = base_t + modal_predict_stacked(
                    stacked_params, hist_dev, smax_v, smin_v, sur,
                    mz, fmask_v, ens=ens_m,
                )[:, :n, :].astype(base_t.dtype)
            else:
                blockpred = modal_predict_stacked(
                    stacked_params, hist_dev, smax_v, smin_v, sur,
                    modal_pack, fmask_v, ens=ens_m,
                )
            preds = blockpred[:, :n, :].astype(state_dtype)
            if sur.pred_consensus:
                preds = prediction_consensus(
                    preds, sp.sgi, sp.smask, sp.SD
                )
            if sur.pred_smooth:
                preds = smooth_preds(
                    preds, hist_dev.astype(state_dtype), sur.pred_smooth
                )
            if getattr(sur, "pred_anchor", False):
                preds = anchor_block(sp, carry, preds)
            d0c, dnc, tc = carry
            (traj_b, shared_b), carry = solver.run(
                d0c, dnc, tc, n, sync=False, preds=preds,
                save_every=se_run,
            )
            write_seg(traj_b)
            i = num_steps

    # per-rank fallback loop (stacked path has already consumed all steps)
    i = num_steps if stacked_ok else n_sync
    while i < num_steps:
        n = min(block, num_steps - i)
        preds = np.zeros((P, n, S3))
        for r in range(P):
            Dr = 3 * len(maps.shared_nodes[r])
            if Dr == 0:
                continue
            params, smax, smin, D_in, padded, m_info, ens_r = models[r][:7]
            if ens_r > 1:
                import jax

                # fallback path: average member predictions via a small
                # host loop (the stacked fast path vmaps instead)
                members = [
                    jax.tree.map(lambda a: a[e], params)
                    for e in range(ens_r)
                ]
            else:
                members = [params]

            def _avg_predict(hist_in, mx, mn, fmask_in):
                outs = [
                    phase_interleaved_predict(
                        p, hist_in, mx, mn,
                        sur.n_past, sur.n_future, sur.filter_size,
                        feat_mask=fmask_in,
                    )
                    for p in members
                ]
                return sum(outs) / len(outs)

            fmask = None
            if m_info is not None:
                # modal model: project the physical window to mode
                # coefficients, predict, reconstruct (models/modal.py)
                from ..models.modal import from_modal, to_modal

                mu, basis = m_info
                hist_p = shared_hist[
                    r, i - sur.n_past * sur.filter_size : i, : mu.shape[0]
                ]
                histc = np.zeros((hist_p.shape[0], D_in))
                histc[:, : basis.shape[0]] = to_modal(hist_p, mu, basis)
                fmask = jnp.zeros((D_in,), dtype=jnp.dtype(sur.dtype))
                fmask = fmask.at[: basis.shape[0]].set(1.0)
                coefs = _avg_predict(
                    jnp.asarray(histc, dtype=jnp.dtype(sur.dtype)),
                    smax, smin, fmask,
                )
                rec = from_modal(
                    np.asarray(coefs)[:n, : basis.shape[0]], mu, basis
                )
                preds[r, :, : Dr] = rec[:, :Dr]
                continue
            if padded:
                # stacked-trained model: feed the padded trailing window
                # (zeros on pad dims before scaling — the training
                # convention) with the feature mask on the decode
                Dr_feed = D_in
                fmask = jnp.zeros((D_in,), dtype=jnp.dtype(sur.dtype))
                fmask = fmask.at[:Dr].set(1.0)
            else:
                Dr_feed = Dr
            hist = jnp.asarray(
                shared_hist[r, i - sur.n_past * sur.filter_size : i, :Dr_feed],
                dtype=jnp.dtype(sur.dtype),
            )
            blockpred = _avg_predict(hist, smax, smin, fmask)
            preds[r, :, :Dr] = np.asarray(blockpred)[:n, :Dr]
        preds = jnp.asarray(preds, dtype=state_dtype)
        if sur.pred_consensus:
            preds = prediction_consensus(preds, sp.sgi, sp.smask, sp.SD)
        if getattr(sur, "pred_anchor", False):
            preds = anchor_block(sp, carry, preds)
        d0c, dnc, tc = carry
        (traj_b, shared_b), carry = solver.run(
            d0c, dnc, tc, n,
            sync=False, preds=preds,
            save_every=se_run,
        )
        shared_hist[:, i : i + n] = np.asarray(shared_b)
        write_seg(traj_b)
        i += n
        if verbose:
            print(f"[online] step {i}/{num_steps}")

    elapsed = time.perf_counter() - t_start
    if verbose:
        print(
            f"[online] {num_steps} steps in {elapsed:.2f}s "
            f"({num_steps/elapsed:.0f} steps/s)"
        )
    from ..utils import stage_log

    stage_log(cfg).log(
        "stage4_online",
        steps=num_steps,
        n_sync=n_sync,
        block=block,
        blocks=-(-(num_steps - n_sync) // block),
        seconds=round(elapsed, 3),
        steps_per_sec=round(num_steps / elapsed, 1),
        comm_free_fraction=round(
            (num_steps - n_sync
             - (n_resync_steps if stacked_ok else 0)) / num_steps, 4
        ),
        resync_blocks=int(getattr(sur, "resync_blocks", 0) or 0),
        stacked_predictor=bool(stacked_ok),
        n_parts=P,
        warmup_s=round(tprof["warmup_s"], 3),
        first_group_s=round(tprof["first_group_s"], 3),
        fetch_s=round(tprof["fetch_s"], 3),
        write_s=round(tprof["write_s"], 3),
    )

    assert rec_off == n_rec_total, (rec_off, n_rec_total)
    traj = np.asarray(traj_full)  # (P, T/se_run, DL)
    if se_run == 1 and se > 1:
        traj = traj[:, ::se, :]
    for r in range(P):
        save_displacement(store.modeled_h5(r), rank_trajectory(ctx, traj, r))
    if tstore is not None:
        # artifacts are complete — drop the mid-run checkpoint so a future
        # run of a (possibly reconfigured) stage starts fresh
        tstore.cleanup()
    return ctx


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu stage 4: online predictor")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--ckpt-every", type=int, default=None,
                    help="checkpoint carry + trajectory at block-group "
                         "boundaries (any nonzero value enables)")
    ap.add_argument("--resume", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="resume from an existing stage-4 checkpoint "
                         "(--no-resume starts fresh)")
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    if args.steps:
        cfg.solver.num_steps = args.steps
    if args.ckpt_every is not None:
        cfg.solver.ckpt_every = args.ckpt_every
    run(cfg, resume=args.resume)


if __name__ == "__main__":
    main()
