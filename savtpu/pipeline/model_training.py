"""Stage 3: per-rank surrogate training.

Equivalent of Model_training.py: each rank's model trains independently on
its own shared-DOF trace (zero cross-rank traffic — task parallelism,
SURVEY.md §2.8). Saves loss/accuracy CSVs + PNG curves, the model weights,
and a JSON sidecar with the architecture *and* the training scaling
constants (the reference recomputes those in the online stage,
Online_predictor.py:128-136 — the sidecar records them, and online still
cross-checks by recomputation).
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import Config
from ..io.artifacts import ArtifactStore, load_displacement, save_params
from ..models import fit, scale_to_zero_one, strided_windows, train_val_split


def effective_filter(cfg: Config) -> int:
    """Window stride in *stored-trace rows*. Stage 1 stores one row every
    ``save_every`` steps, so striding the stored trace by
    ``filter_size // save_every`` reads exactly the rows at step multiples
    of filter_size — bit-identical training windows to a save_every=1 run
    (the reference trains on data[::n_s], DNN_tools.py:291)."""
    se = cfg.solver.save_every
    n_s = cfg.surrogate.filter_size
    if se > 1 and n_s % se:
        raise ValueError(
            f"surrogate.filter_size ({n_s}) must be a multiple of "
            f"solver.save_every ({se}) so training windows land on stored "
            f"rows"
        )
    return max(n_s // se, 1)


def _phase_windows(trace, sur, eff_filter):
    """Training windows, optionally augmented over coarse-grid phase
    offsets (SurrogateConfig.window_phases). Phase 0 comes first so
    callers can derive the scaling constants from the reference's
    single-phase windows."""
    from ..models import strided_windows

    X, Y = strided_windows(
        trace, sur.n_past, sur.n_future * sur.rollout_windows,
        eff_filter, sur.cut_off,
    )
    phases = min(max(int(getattr(sur, "window_phases", 1) or 1), 1),
                 eff_filter)
    if phases <= 1:
        return X, Y, X, Y
    Xa, Ya = [X], [Y]
    for p in range(1, phases):
        Xp, Yp = strided_windows(
            trace[p:], sur.n_past, sur.n_future * sur.rollout_windows,
            eff_filter, sur.cut_off,
        )
        Xa.append(Xp)
        Ya.append(Yp)
    return np.concatenate(Xa), np.concatenate(Ya), X, Y


def _cl_seqs(trace, smax, smin, sur, eff_filter, n_phases=3):
    """Scaled coarse-grid sequences of the TRAINING portion (the same
    trace[:cut_off][::eff_filter] grid strided_windows trains on), for
    the linear arch's closed-loop ridge selection (models/linear.py:
    fit_linear). A few phase offsets guard against a single phase's
    replay being accidentally benign."""
    cut = np.asarray(trace)[: int(sur.cut_off * len(trace))]
    s = (cut - smax) / (smax - smin)
    return [s[p::eff_filter] for p in range(min(n_phases, eff_filter))]


def _stage1_dt(cfg: Config) -> float:
    """Timestep of the recorded trace, from the stage-1 metrics.jsonl
    event (pipeline/data_prepare.py logs it) — stage 3 deliberately
    re-derives everything from stored artifacts, never the live mesh."""
    import json
    from pathlib import Path

    p = Path(cfg.workdir) / "metrics.jsonl"
    dt = None
    if p.exists():
        for line in p.read_text().splitlines():
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("event") == "stage1_solve" and "dt" in ev:
                dt = float(ev["dt"])
    if dt is None:
        raise FileNotFoundError(
            f"arch='expfit' needs the stage-1 dt from {p} "
            f"(event stage1_solve) — run stage 1 first"
        )
    return dt


def _run_expfit(cfg: Config, store: ArtifactStore, n_parts: int,
                verbose: bool):
    """arch="expfit": two-segment matrix-pencil system identification per
    rank (models/expfit.py). Host float64, milliseconds per rank — no
    epochs, no device."""
    from ..models.expfit import eval_expfit, fit_expfit

    sur = cfg.surrogate
    dt = _stage1_dt(cfg)
    se = max(int(cfg.solver.save_every), 1)
    ramp_s = float(getattr(sur, "expfit_ramp_s", 1.0) or 0.0)
    results = {}

    # ranks are independent (load -> PCA -> pencil fits -> sidecar), so
    # fan the per-rank work over host threads — the LAPACK SVDs and the
    # pencil fits release the GIL; logging stays serial below. 463 s for
    # 256 ranks at 384^3 was ~1.8 s/rank of pure host work.
    def _fit_one(r):
        trace = load_displacement(store.shared_dof_h5(r)).T  # (T, D)
        T, D = trace.shape
        cut = int(sur.cut_off * T)
        modal_meta = {}
        co = trace
        if sur.modal_dim:
            from ..models.modal import modal_basis, to_modal

            mu, basis = modal_basis(trace[:cut], sur.modal_dim)
            modal_meta = {
                "modal_dim": int(basis.shape[0]),
                "modal_phys_size": int(D),
                "modal_mean": mu.tolist(),
                "modal_basis": basis.tolist(),
            }
            co = to_modal(trace, mu, basis)
        C = co.shape[1]
        ramp_end_row = (ramp_s / (dt * se)) if ramp_s > 0 else 0.0
        params, info = fit_expfit(
            co[:cut], ramp_end_row, order=sur.expfit_order
        )
        # held-out check WITHIN the training contract: refit on the first
        # 80% of the cut rows, score on the last 20%
        cut8 = int(0.8 * cut)
        p8, _ = fit_expfit(co[:cut8], ramp_end_row, order=sur.expfit_order)
        val = eval_expfit(p8, np.arange(cut8, cut, dtype=float),
                          ramp_end_row)
        denom = float(np.linalg.norm(co[cut8:cut])) or 1.0
        val_rel = float(np.linalg.norm(val - co[cut8:cut]) / denom)
        fit_full = eval_expfit(params, np.arange(cut, dtype=float),
                               ramp_end_row)
        fit_rel = float(
            np.linalg.norm(fit_full - co[:cut])
            / (float(np.linalg.norm(co[:cut])) or 1.0)
        )
        save_params(
            store.model_file(r),
            params,
            meta={
                **modal_meta,
                "arch": "expfit",
                "input_size": int(C),
                "real_input_size": int(C),
                "padded_input": False,
                "expfit_order": int(sur.expfit_order),
                "expfit_modes": int(info["n_modes"]),
                "expfit_ramp_end_row": float(ramp_end_row),
                "expfit_has_post_segment": bool(info["has_post_segment"]),
                "save_every": int(se),
                "n_past": sur.n_past,
                "n_future": sur.n_future,
                "filter_size": sur.filter_size,
                "cut_off": sur.cut_off,
                "final_train_loss": fit_rel,
                "final_val_r2": 1.0 - val_rel**2,
            },
        )
        return r, params, fit_rel, val_rel, int(C), int(cut), info

    import os
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(16, os.cpu_count() or 1, n_parts))
    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            fits = list(ex.map(_fit_one, range(n_parts)))
    else:
        fits = [_fit_one(r) for r in range(n_parts)]

    from ..utils import stage_log

    log = stage_log(cfg)
    for r, params, fit_rel, val_rel, C, cut, info in fits:
        if verbose:
            print(
                f"[model_training] rank {r}: expfit {info['n_modes']} "
                f"modes, train rel {fit_rel:.2e}, held-out rel "
                f"{val_rel:.2e}"
            )
        ramp_end_row = (ramp_s / (dt * se)) if ramp_s > 0 else 0.0
        if not info["has_post_segment"] and ramp_end_row < cut and r == 0:
            # the pencil saw the ramp end but too few autonomous rows
            # (< max(4*order, 32)) and fell back to the frozen-ramp
            # model — measured 50x worse than a true two-segment fit at
            # 192^3 (docs/STATUS_r3.md). More training data fixes it.
            print(
                "[model_training] WARNING: expfit post-ramp training "
                f"rows ({int(cut - ramp_end_row)}) < 4*order — frozen-"
                "ramp fallback in use; raise surrogate.cut_off or run "
                "more steps for a proper two-segment fit"
            )
        results[r] = (params, {"fit_rel": fit_rel, "val_rel": val_rel})
        log.log(
            "stage3_train_rank",
            rank=r,
            arch="expfit",
            input_size=int(C),
            n_modes=int(info["n_modes"]),
            fit_rel=fit_rel,
            val_rel=val_rel,
        )
    return results


def _run_hybrid(cfg: Config, store: ArtifactStore, n_parts: int,
                verbose: bool):
    """arch="hybrid": expfit base + LSTM residual (savtpu extension).

    The matrix-pencil LTI fit captures the bulk of the interface motion
    OPEN-LOOP in time (zero autoregressive drift, models/expfit.py); a
    stacked LSTM then trains on the RESIDUAL mode-coefficient trace —
    everything the LTI model cannot represent (nonlinearity, e.g.
    material.model="neo_hookean"; nonstationarity). Online, the block
    prediction is base(t) + LSTM(residual history): the LSTM's
    autoregressive drift applies only to the residual amplitude, so the
    global error is scaled down by the residual/signal ratio — the
    drift-breaking structure the round-3 cut_off=1.0 diagnostic showed a
    raw LSTM cannot reach (docs/STATUS_r3.md). Requires modal_dim > 0
    (the expfit segment works in the PCA mode subspace) and the stacked
    online path.
    """
    from ..models.expfit import eval_expfit, fit_expfit
    from ..models.modal import modal_basis, to_modal
    from ..models.training import fit_stacked

    sur = cfg.surrogate
    if not sur.modal_dim:
        raise ValueError("arch='hybrid' requires surrogate.modal_dim > 0")
    dt = _stage1_dt(cfg)
    se = max(int(cfg.solver.save_every), 1)
    ramp_s = float(getattr(sur, "expfit_ramp_s", 1.0) or 0.0)
    ramp_end_row = (ramp_s / (dt * se)) if ramp_s > 0 else 0.0
    eff_filter = effective_filter(cfg)

    # per-rank: modal projection + expfit base fit + residual trace
    res_traces, modal_metas, exp_params, exp_metas, dims = [], [], [], [], []
    for r in range(n_parts):
        trace = load_displacement(store.shared_dof_h5(r)).T  # (T, D)
        T, D = trace.shape
        cut = int(sur.cut_off * T)
        mu, basis = modal_basis(trace[:cut], sur.modal_dim)
        co = to_modal(trace, mu, basis)
        params_e, info = fit_expfit(
            co[:cut], ramp_end_row, order=sur.expfit_order
        )
        base = eval_expfit(params_e, np.arange(T, dtype=float),
                           ramp_end_row)
        res = co - base
        fit_rel = float(
            np.linalg.norm(res[:cut])
            / (float(np.linalg.norm(co[:cut])) or 1.0)
        )
        if verbose:
            print(
                f"[model_training] rank {r}: hybrid expfit "
                f"{info['n_modes']} modes, residual/signal {fit_rel:.2e}"
            )
        res_traces.append(res)
        dims.append(res.shape[1])
        modal_metas.append({
            "modal_dim": int(basis.shape[0]),
            "modal_phys_size": int(D),
            "modal_mean": mu.tolist(),
            "modal_basis": basis.tolist(),
        })
        exp_params.append(params_e)
        exp_metas.append({
            "expfit_order": int(sur.expfit_order),
            "expfit_modes": int(info["n_modes"]),
            "expfit_ramp_end_row": float(ramp_end_row),
            "expfit_has_post_segment": bool(info["has_post_segment"]),
            "expfit_residual_rel": fit_rel,
        })

    # stacked LSTM on the residual coefficient traces (uniform pad to Kmax)
    Kmax = max(dims)
    Xs, Ys, smaxs, smins = [], [], [], []
    per_feature = sur.scale_mode == "per_feature"
    for res in res_traces:
        X, Y, X0, Y0 = _phase_windows(res, sur, eff_filter)
        _, _, smax, smin = scale_to_zero_one(X0, Y0, mode=sur.scale_mode)
        if per_feature:
            fmax = np.zeros(Kmax)
            fmin = np.full(Kmax, -1.0)
            fmax[: X.shape[-1]] = smax
            fmin[: X.shape[-1]] = smin
            smax, smin = fmax, fmin
        Xs.append(X)
        Ys.append(Y)
        smaxs.append(smax)
        smins.append(smin)
    G = min(x.shape[0] for x in Xs)
    Xp = np.zeros((n_parts, G, sur.n_past, Kmax))
    Yp = np.zeros((n_parts, G, sur.n_future * sur.rollout_windows, Kmax))
    fm = np.zeros((n_parts, Kmax))
    for r in range(n_parts):
        Xp[r, :, :, : dims[r]] = Xs[r][:G]
        Yp[r, :, :, : dims[r]] = Ys[r][:G]
        Xp[r] = (Xp[r] - smaxs[r]) / (smaxs[r] - smins[r])
        Yp[r] = (Yp[r] - smaxs[r]) / (smaxs[r] - smins[r])
        fm[r, : dims[r]] = 1.0
    if verbose:
        print(
            f"[model_training] hybrid stacked residual LSTM: {n_parts} "
            f"shards, K={Kmax}, {G} windows each, {sur.epochs} epochs"
        )
    log = (lambda s: print(f"[hybrid] {s}")) if verbose else (lambda s: None)
    import time as _time

    import jax

    _t0 = _time.perf_counter()
    params, hist = fit_stacked(
        sur, Xp, Yp, fm, log_every=50 if verbose else 0, log_fn=log,
    )
    from ..utils import stage_log

    stage_log(cfg).log(
        "stage3_train_hybrid",
        shards=n_parts,
        input_size=int(Kmax),
        windows=int(G),
        epochs=sur.epochs,
        seconds=round(_time.perf_counter() - _t0, 3),
        residual_rel=[m["expfit_residual_rel"] for m in exp_metas],
        final_train_loss=[float(x) for x in hist["train_loss"][-1]],
        final_val_r2=[float(x) for x in hist["val_r2"][-1]],
    )

    results = {}
    for r in range(n_parts):
        lstm_r = jax.tree.map(lambda a: np.asarray(a[r]), params)
        hist_r = {k: hist[k][:, r].tolist() for k in hist}
        store.save_training_curves(r, hist_r)
        save_params(
            store.model_file(r),
            {"expfit": exp_params[r], "lstm": lstm_r},
            meta={
                **modal_metas[r],
                **exp_metas[r],
                "arch": "hybrid",
                "window_phases": int(getattr(sur, "window_phases", 1) or 1),
                "input_size": int(Kmax),
                "real_input_size": int(dims[r]),
                "padded_input": True,
                "hidden_size": sur.hidden_size,
                "num_layers_encoder": sur.num_layers_encoder,
                "bidirectional": sur.bidirectional,
                "target_mode": getattr(sur, "target_mode", "absolute"),
                "n_past": sur.n_past,
                "n_future": sur.n_future,
                "rollout_windows": sur.rollout_windows,
                "filter_size": sur.filter_size,
                "cut_off": sur.cut_off,
                "save_every": int(se),
                "scale_mode": sur.scale_mode,
                "scale_max": (
                    smaxs[r].tolist() if per_feature else smaxs[r]
                ),
                "scale_min": (
                    smins[r].tolist() if per_feature else smins[r]
                ),
                "final_train_loss": hist_r["train_loss"][-1],
                "final_val_r2": hist_r["val_r2"][-1],
            },
        )
        results[r] = ({"expfit": exp_params[r], "lstm": lstm_r}, hist_r)
    return results


def run(cfg: Config, n_parts: int | None = None, verbose: bool = True):
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    sur = cfg.surrogate
    n_parts = n_parts or cfg.partition.n_parts
    if getattr(sur, "arch", "lstm") == "expfit":
        return _run_expfit(cfg, store, n_parts, verbose)
    if getattr(sur, "arch", "lstm") == "hybrid":
        return _run_hybrid(cfg, store, n_parts, verbose)
    stacked = sur.stacked if sur.stacked is not None else n_parts > 1
    if stacked:
        return _run_stacked(cfg, store, n_parts, verbose)
    eff_filter = effective_filter(cfg)
    results = {}
    for r in range(n_parts):
        trace = load_displacement(store.shared_dof_h5(r)).T  # (T, D)
        modal_meta = {}
        if sur.modal_dim:
            from ..models.modal import modal_basis, to_modal

            n_train = int(sur.cut_off * len(trace))
            mu, basis = modal_basis(trace[:n_train], sur.modal_dim)
            modal_meta = {
                "modal_dim": int(basis.shape[0]),
                "modal_phys_size": int(trace.shape[1]),
                "modal_mean": mu.tolist(),
                "modal_basis": basis.tolist(),
            }
            trace = to_modal(trace, mu, basis)
        input_size = trace.shape[1]
        X, Y, X0, Y0 = _phase_windows(trace, sur, eff_filter)
        _, _, smax, smin = scale_to_zero_one(X0, Y0, mode=sur.scale_mode)
        X = np.asarray((X - smax) / (smax - smin))
        Y = np.asarray((Y - smax) / (smax - smin))
        rng = np.random.default_rng(sur.seed + 17 * r)
        tr, va = train_val_split(len(X), sur.train_portion, rng)
        if verbose:
            print(
                f"[model_training] rank {r}: input_size={input_size}, "
                f"{len(tr)} train / {len(va)} val windows, "
                f"{sur.epochs} epochs"
            )
        log = (lambda s: print(f"[rank {r}] {s}")) if verbose else (lambda s: None)
        seqs = (
            _cl_seqs(trace, smax, smin, sur, eff_filter)
            if sur.arch == "linear" else None
        )
        params, hist = fit(
            sur, X[tr], Y[tr], X[va], Y[va],
            log_every=50 if verbose else 0, log_fn=log, seqs=seqs,
        )
        store.save_training_curves(r, hist)
        save_params(
            store.model_file(r),
            params,
            meta={
                **modal_meta,
                "arch": sur.arch,
                "window_phases": int(getattr(sur, "window_phases", 1) or 1),
                "input_size": int(input_size),
                "hidden_size": sur.hidden_size,
                "num_layers_encoder": sur.num_layers_encoder,
                "bidirectional": sur.bidirectional,
                "target_mode": getattr(sur, "target_mode", "absolute"),
                "n_past": sur.n_past,
                "n_future": sur.n_future,
                "rollout_windows": sur.rollout_windows,
                "filter_size": sur.filter_size,
                "cut_off": sur.cut_off,
                "scale_mode": sur.scale_mode,
                "scale_max": (
                    np.asarray(smax).tolist()
                    if sur.scale_mode == "per_feature" else float(smax)
                ),
                "scale_min": (
                    np.asarray(smin).tolist()
                    if sur.scale_mode == "per_feature" else float(smin)
                ),
                "final_train_loss": hist["train_loss"][-1],
                "final_val_r2": hist["val_r2"][-1] if hist["val_r2"] else None,
            },
        )
        results[r] = (params, hist)
        from ..utils import stage_log

        stage_log(cfg).log(
            "stage3_train_rank",
            rank=r,
            input_size=int(input_size),
            epochs=sur.epochs,
            final_train_loss=hist["train_loss"][-1],
            final_val_r2=hist["val_r2"][-1] if hist["val_r2"] else None,
        )
    return results


def run_grid(cfg: Config, batch_sizes, learning_rates, hidden_sizes,
             verbose: bool = True):
    """Hyperparameter grid over (n_B, eta0, n_H) — the reference's
    triple loop (Model_training.py:19-21). Each combination trains into
    its own run-tag directory ('nB-10-nH-50-Lr-0.0005-filter=150',
    config.run_tag), so artifact layouts per combo match the reference's
    exactly and the online stage picks any combo by setting the same
    surrogate fields."""
    import copy

    results = {}
    for nB in batch_sizes:
        for lr in learning_rates:
            for nH in hidden_sizes:
                c = copy.deepcopy(cfg)
                c.surrogate.batch_size = int(nB)
                c.surrogate.learning_rate = float(lr)
                c.surrogate.hidden_size = int(nH)
                if verbose:
                    print(f"[model_training] grid: {c.surrogate.run_tag()}")
                results[(nB, lr, nH)] = run(c, verbose=verbose)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu stage 3: model training")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--grid-batch-sizes", type=int, nargs="+", default=None,
                    help="n_B grid (reference Model_training.py:19)")
    ap.add_argument("--grid-lrs", type=float, nargs="+", default=None,
                    help="eta0 grid (Model_training.py:20)")
    ap.add_argument("--grid-hidden", type=int, nargs="+", default=None,
                    help="n_H grid (Model_training.py:21)")
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    if args.epochs:
        cfg.surrogate.num_epochs = args.epochs
    if args.grid_batch_sizes or args.grid_lrs or args.grid_hidden:
        run_grid(
            cfg,
            args.grid_batch_sizes or [cfg.surrogate.batch_size],
            args.grid_lrs or [cfg.surrogate.learning_rate],
            args.grid_hidden or [cfg.surrogate.hidden_size],
        )
        return
    run(cfg)


if __name__ == "__main__":
    main()


def _run_stacked(cfg: Config, store: ArtifactStore, n_parts: int,
                 verbose: bool):
    """All shards' surrogates in one vmapped training pass: raw windows
    padded to the max shard width, per-shard [-1,0] scaling applied after
    padding, masked recursive decode. Per-rank artifacts stay identical in
    layout; the sidecar records the padding so the online stage feeds the
    model consistently."""
    import jax

    from ..models.training import fit_stacked

    sur = cfg.surrogate
    eff_filter = effective_filter(cfg)
    traces, dims = [], []
    for r in range(n_parts):
        tr = load_displacement(store.shared_dof_h5(r)).T  # (T, Dr)
        traces.append(tr)
        dims.append(tr.shape[1])
    Dmax = max(dims)

    # modal-subspace representation (SurrogateConfig.modal_dim): replace
    # each rank's raw trace with its k PCA-mode coefficients; the basis
    # comes from the training (cut_off) portion only, like the scaling.
    modal = int(sur.modal_dim or 0)
    modal_mus, modal_bases = [], []
    if modal:
        from ..models.modal import modal_basis, to_modal

        phys_dims = dims
        for r in range(n_parts):
            n_train = int(sur.cut_off * len(traces[r]))
            mu, basis = modal_basis(traces[r][:n_train], modal)
            modal_mus.append(mu)
            modal_bases.append(basis)
            traces[r] = to_modal(traces[r], mu, basis)
        dims = [t.shape[1] for t in traces]
        Dmax = max(dims)

    per_feature = sur.scale_mode == "per_feature"
    Xs, Ys, smaxs, smins = [], [], [], []
    for tr in traces:
        X, Y, X0, Y0 = _phase_windows(tr, sur, eff_filter)
        _, _, smax, smin = scale_to_zero_one(X0, Y0, mode=sur.scale_mode)
        if per_feature:
            # pad to (Dmax,) with (0, -1): raw-zero pad dims stay 0 scaled
            fmax = np.zeros(Dmax)
            fmin = np.full(Dmax, -1.0)
            fmax[: X.shape[-1]] = smax
            fmin[: X.shape[-1]] = smin
            smax, smin = fmax, fmin
        Xs.append(X)
        Ys.append(Y)
        smaxs.append(smax)
        smins.append(smin)

    G = min(x.shape[0] for x in Xs)
    Xp = np.zeros((n_parts, G, sur.n_past, Dmax))
    Yp = np.zeros((n_parts, G, sur.n_future * sur.rollout_windows, Dmax))
    fm = np.zeros((n_parts, Dmax))
    for r in range(n_parts):
        # pad raw windows, then scale the whole padded array per shard —
        # the same convention the online predictor applies
        Xp[r, :, :, : dims[r]] = Xs[r][:G]
        Yp[r, :, :, : dims[r]] = Ys[r][:G]
        Xp[r] = (Xp[r] - smaxs[r]) / (smaxs[r] - smins[r])
        Yp[r] = (Yp[r] - smaxs[r]) / (smaxs[r] - smins[r])
        fm[r, : dims[r]] = 1.0

    if verbose:
        print(
            f"[model_training] stacked: {n_parts} shards, Dmax={Dmax}, "
            f"{G} windows each, {sur.epochs} epochs"
        )
    log = (lambda s: print(f"[stacked] {s}")) if verbose else (lambda s: None)
    import time as _time

    seqs = None
    if sur.arch == "linear":
        # padded+scaled+masked coarse sequences of the training portion,
        # mirroring the window convention above, for closed-loop ridge
        # selection (models/linear.py:fit_linear)
        seqs = []
        for r in range(n_parts):
            cut = np.asarray(traces[r])[
                : int(sur.cut_off * len(traces[r]))
            ]
            pad = np.zeros((len(cut), Dmax))
            pad[:, : dims[r]] = cut
            s = ((pad - smaxs[r]) / (smaxs[r] - smins[r])) * fm[r]
            seqs.append(
                [s[p::eff_filter] for p in range(min(3, eff_filter))]
            )

    # seed-ensemble (SurrogateConfig.ensemble): widen the stacked shard
    # axis E-fold — fit_stacked derives per-"shard" init keys and
    # train/val splits from the axis index, so each copy trains from an
    # independent seed on the same windows. De-tiled below; the online
    # stage averages member predictions (modal/scaled space — the scale
    # is per-rank affine, so averaging commutes).
    E = int(getattr(sur, "ensemble", 1) or 1)
    if E > 1 and sur.arch != "lstm":
        raise ValueError("surrogate.ensemble requires arch='lstm'")
    Xp_t = np.concatenate([Xp] * E) if E > 1 else Xp
    Yp_t = np.concatenate([Yp] * E) if E > 1 else Yp
    fm_t = np.concatenate([fm] * E) if E > 1 else fm

    _t0 = _time.perf_counter()
    params, hist = fit_stacked(
        sur, Xp_t, Yp_t, fm_t, log_every=50 if verbose else 0, log_fn=log,
        seqs=seqs,
    )
    from ..utils import stage_log

    stage_log(cfg).log(
        "stage3_train_stacked",
        shards=n_parts,
        input_size=int(Dmax),
        windows=int(G),
        epochs=sur.epochs,
        seconds=round(_time.perf_counter() - _t0, 3),
        final_train_loss=[float(x) for x in hist["train_loss"][-1]],
        final_val_r2=[float(x) for x in hist["val_r2"][-1]],
    )

    results = {}
    for r in range(n_parts):
        if E > 1:
            # (E, ...) member stack per rank; sidecar records "ensemble"
            idx = [e * n_parts + r for e in range(E)]
            params_r = jax.tree.map(
                lambda a: np.stack([np.asarray(a[i]) for i in idx]), params
            )
        else:
            params_r = jax.tree.map(lambda a: np.asarray(a[r]), params)
        hist_r = {
            k: hist[k][:, r].tolist() for k in hist
        }
        store.save_training_curves(r, hist_r)
        modal_meta = {}
        if modal:
            modal_meta = {
                "modal_dim": int(dims[r]),
                "modal_phys_size": int(phys_dims[r]),
                "modal_mean": modal_mus[r].tolist(),
                "modal_basis": modal_bases[r].tolist(),
            }
        save_params(
            store.model_file(r),
            params_r,
            meta={
                **modal_meta,
                "arch": sur.arch,
                "ensemble": E,
                "window_phases": int(getattr(sur, "window_phases", 1) or 1),
                "input_size": int(Dmax),
                "real_input_size": int(dims[r]),
                "padded_input": True,
                "hidden_size": sur.hidden_size,
                "num_layers_encoder": sur.num_layers_encoder,
                "bidirectional": sur.bidirectional,
                "target_mode": getattr(sur, "target_mode", "absolute"),
                "n_past": sur.n_past,
                "n_future": sur.n_future,
                "rollout_windows": sur.rollout_windows,
                "filter_size": sur.filter_size,
                "cut_off": sur.cut_off,
                "scale_mode": sur.scale_mode,
                "scale_max": (
                    smaxs[r].tolist() if per_feature else smaxs[r]
                ),
                "scale_min": (
                    smins[r].tolist() if per_feature else smins[r]
                ),
                "final_train_loss": hist_r["train_loss"][-1],
                "final_val_r2": hist_r["val_r2"][-1],
            },
        )
        results[r] = (params_r, hist_r)
    return results
