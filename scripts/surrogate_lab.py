"""Offline surrogate design lab: closed-loop replay on stored traces.

With pred_consensus off, the online stage-4 history is EXACTLY the
previous block's predictions (the comm-free scan overwrites shared DOFs
with them, savtpu/parallel/sharded.py step()), so the entire 33-block
closed-loop prediction sequence is computable on host from the stage-1
shared traces alone — no solver, no TPU. The noise-transfer study
(docs/STATUS_r3.md) calibrated how shared-row error maps to global
interior error:

    err_global^2 ~ (3.6 * eps_in)^2 + (15 * eps_out)^2

so this lab scores surrogate variants (arch/lambda/phases/modal_dim/...)
in seconds and only the winner needs a confirming TPU run.

Usage: python scripts/surrogate_lab.py --dir runs/scale_96_r3 --parts 16
           --variants '[{"arch":"linear","ridge":1e-2,"phases":3}, ...]'
"""

from __future__ import annotations

import argparse
import json
import sys
from dataclasses import replace
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def lowpass_ma(x, win):
    """Centered moving average along axis 0 (matches smooth_preds'
    window semantics closely enough for band splitting)."""
    h = max(1, win // 2)
    w = 2 * h + 1
    ext = np.concatenate([x[:h][::-1], x, x[-h:][::-1]], axis=0)
    cs = np.cumsum(ext, axis=0)
    cs = np.concatenate([np.zeros_like(cs[:1]), cs], axis=0)
    return (cs[w:] - cs[:-w]) / w


def band_split_eps(pred, truth, win=151):
    """(eps_total, eps_in, eps_out): rel-L2 of the prediction error and
    its in/out-of-band parts, amplitude-weighted across ranks."""
    err = pred - truth
    den = np.sqrt((truth**2).sum())
    e_in = lowpass_ma(err, win)
    e_out = err - e_in
    return (
        float(np.sqrt((err**2).sum()) / den),
        float(np.sqrt((e_in**2).sum()) / den),
        float(np.sqrt((e_out**2).sum()) / den),
    )


def replay(traces, models, sur, n_sync, num_steps, save_every):
    """Closed-loop schedule replay. traces[r]: (T_rows, Dr) stored rows
    (one per save_every steps). Returns per-rank predicted rows aligned
    with the stored rows, for rows >= n_sync/save_every."""
    import jax.numpy as jnp

    from savtpu.models.predictor import phase_interleaved_predict

    W = sur.n_past * sur.filter_size          # history window, in steps
    Wr = W // save_every                      # ... in stored rows
    block = sur.n_future * sur.filter_size
    br = block // save_every
    preds_full = []
    for r, (trace, m) in enumerate(zip(traces, models)):
        params, smax, smin, modal = m
        hist = trace[: n_sync // save_every][-Wr:]  # true warm-up rows
        rows = []
        i = n_sync
        while i < num_steps:
            n = min(block, num_steps - i)
            if modal is not None:
                mu, basis = modal
                histc = (hist - mu) @ basis.T
            else:
                histc = hist
            # the predictor consumes per-STEP rows; with save_every the
            # coarse grid is eff_filter = filter_size//save_every rows
            blockc = phase_interleaved_predict(
                params, jnp.asarray(histc, jnp.float32),
                smax, smin, sur.n_past, sur.n_future,
                sur.filter_size // save_every,
            )
            blockc = np.asarray(blockc, np.float64)[: n // save_every]
            if modal is not None:
                blockp = blockc @ basis + mu
            else:
                blockp = blockc
            rows.append(blockp)
            hist = np.concatenate([hist, blockp])[-Wr:]
            i += n
        preds_full.append(np.concatenate(rows))
    return preds_full


def fit_variant(traces, sur, eff_filter):
    """Stage-3-equivalent fit on host; returns per-rank
    (params, smax, smin, modal_info)."""
    from savtpu.models import scale_to_zero_one
    from savtpu.models.modal import modal_basis, to_modal
    from savtpu.models.training import fit
    from savtpu.pipeline.model_training import _phase_windows

    models = []
    for trace in traces:
        modal = None
        tr = trace
        if sur.modal_dim:
            n_train = int(sur.cut_off * len(tr))
            mu, basis = modal_basis(tr[:n_train], sur.modal_dim)
            modal = (mu, basis)
            tr = to_modal(tr, mu, basis)
        X, Y, X0, Y0 = _phase_windows(tr, sur, eff_filter)
        _, _, smax, smin = scale_to_zero_one(X0, Y0, mode=sur.scale_mode)
        Xs = np.asarray((X - smax) / (smax - smin))
        Ys = np.asarray((Y - smax) / (smax - smin))
        rng = np.random.default_rng(sur.seed)
        idx = rng.permutation(len(Xs))
        ntr = int(sur.train_portion * len(Xs))
        params, hist = fit(
            sur, Xs[idx[:ntr]], Ys[idx[:ntr]],
            Xs[idx[ntr:]], Ys[idx[ntr:]], log_every=0,
        )
        models.append((params, float(smax), float(smin), modal))
    return models


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, required=True)
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--variants", type=str, required=True,
                    help="JSON list of surrogate-config overrides "
                         "(keys: arch, ridge, phases, modal, n_past, "
                         "n_future, rho_max, var_order, epochs, hidden)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from savtpu.config import Config
    from savtpu.io.artifacts import ArtifactStore, load_displacement

    cfg = Config()
    import math

    cfg.solver.save_every = math.gcd(args.steps, cfg.surrogate.filter_size)
    se = cfg.solver.save_every
    store = ArtifactStore(
        str(Path(args.dir) / "Results"),
        str(Path(args.dir) / "Distributed_save"),
        cfg.surrogate.run_tag(),
    )
    traces = [
        load_displacement(store.shared_dof_h5(r)).T
        for r in range(args.parts)
    ]
    n_sync = (cfg.surrogate.i_cri + 1)
    rows_sync = n_sync // se
    results = []
    for v in json.loads(args.variants):
        sur = cfg.surrogate
        sur.arch = v.get("arch", "lstm")
        sur.ridge_lambda = v.get("ridge", 1e-6)
        sur.window_phases = v.get("phases", 1)
        sur.modal_dim = v.get("modal", 0)
        sur.linear_rho_max = v.get("rho_max", 0.999)
        sur.var_order = v.get("var_order", 0)
        sur.n_past = v.get("n_past", 20)
        sur.n_future = v.get("n_future", 20)
        if v.get("epochs"):
            sur.num_epochs = v["epochs"]
        if v.get("hidden"):
            sur.hidden_size = v["hidden"]
        eff = sur.filter_size // se
        models = fit_variant(traces, sur, eff)
        preds = replay(traces, models, sur, n_sync, args.steps, se)
        eps_t, eps_i, eps_o, eg = [], [], [], []
        for r in range(args.parts):
            truth = traces[r][rows_sync : args.steps // se]
            t, i, o = band_split_eps(
                preds[r][: len(truth)], truth, win=max(151 // se, 3)
            )
            eps_t.append(t)
            eps_i.append(i)
            eps_o.append(o)
        # amplitude-weighted across ranks
        num_t = num_i = num_o = den = 0.0
        for r in range(args.parts):
            truth = traces[r][rows_sync : args.steps // se]
            d2 = (truth**2).sum()
            num_t += (eps_t[r] ** 2) * d2
            num_i += (eps_i[r] ** 2) * d2
            num_o += (eps_o[r] ** 2) * d2
            den += d2
        et, ei, eo = (
            np.sqrt(num_t / den), np.sqrt(num_i / den), np.sqrt(num_o / den)
        )
        est_global = float(np.sqrt((3.6 * ei) ** 2 + (15 * eo) ** 2))
        row = {
            **v,
            "eps_shared": round(float(et), 5),
            "eps_in": round(float(ei), 5),
            "eps_out": round(float(eo), 5),
            "est_global_rel_l2": round(est_global, 5),
        }
        print(json.dumps(row), flush=True)
        results.append(row)
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
