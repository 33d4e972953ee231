"""Pure-LSTM drift ablation (VERDICT r4 #6): give the reference's own
architecture (per-rank LSTM encoder-decoder, DNN_tools.py:85-98) its
best shot at scale, or produce the rigorous negative.

The online failure mode is OPEN-LOOP FEEDBACK DRIFT: after warm-up the
history window is the model's own output (Online_predictor.py:298-301),
so training-grid accuracy says nothing — what matters is chained
rollout. This harness trains variants of the pure LSTM on the recorded
stage-2 shared traces and measures exactly that regime offline: chained
window-by-window rollout on the coarse grid, error vs the recorded
truth, at increasing horizons. Variants:

  base       the reference configuration (absolute targets)
  incr       increment-space targets (SurrogateConfig.target_mode)
  noise      input-noise injection (scheduled-sampling-style robustness)
  rollout    multi-window rollout training (trains THROUGH its own
             feedback, rollout_windows)
  combo      incr + noise + rollout
  interface  per-interface submodels: each rank's shared channels are
             split by the owner-set of the shared node (one model per
             physical interface instead of one per rank), trained as
             extra pseudo-shards in the same stacked pass

Usage:
  python scripts/lstm_ablation.py --dir runs/lin_192_r5 --cells 192 8 8 \
      --parts 64 --steps 200000 [--ranks 8] [--variants base,incr,...]

Stages 1-2 are run first when the artifact dir lacks them (same
configuration contract as scripts/rerun_online.py).
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def _interface_groups(maps, rank):
    """Split a rank's shared nodes by the SET of other ranks owning each
    node — one group per physical interface (VERDICT r4 #6's
    'per-interface submodels'). Returns a list of channel-index arrays
    into the rank's 3*|shared| trace row."""
    sh = np.asarray(maps.shared_nodes[rank])
    owners = {int(g): [] for g in sh}
    for p in range(maps.n_parts):
        if p == rank:
            continue
        for g in np.asarray(maps.shared_nodes[p]):
            if int(g) in owners:
                owners[int(g)].append(p)
    keys = {}
    for i, g in enumerate(sh):
        k = tuple(owners[int(g)])
        keys.setdefault(k, []).append(i)
    groups = []
    for k in sorted(keys):
        idx = np.asarray(keys[k])
        ch = (3 * idx[:, None] + np.arange(3)).reshape(-1)
        groups.append(ch)
    return groups


def _chained_rollout_rel_l2(params_p, fmask, seq_scaled, sur, horizons,
                            span):
    """Chained open-loop rollout: encoder input = the first n_past rows
    of ``seq_scaled``, then pure model feedback. Error vs the following
    true rows, converted to physical AMPLITUDE units by the per-feature
    affine span (offsets cancel in the difference; the denominator uses
    the same centered units, so the ratio is scale-consistent across
    variants). Returns {horizon_in_windows: rel_l2}."""
    from savtpu.models.training import chained_predict

    n_p, n_f = sur.n_past, sur.n_future
    K = max(horizons)
    x0 = jnp.asarray(seq_scaled[None, :n_p], jnp.float32)
    pred = np.asarray(chained_predict(
        params_p, x0, n_f, K, feat_mask=jnp.asarray(fmask, jnp.float32)
    )[0])  # (K*n_f, D)
    truth = seq_scaled[n_p : n_p + K * n_f]
    n_avail = len(truth)
    mask = np.asarray(fmask, bool)
    out = {}
    for h in horizons:
        n = min(h * n_f, n_avail)
        d = (pred[:n] - truth[:n]) * span
        t = truth[:n] * span
        num = np.linalg.norm(d[:, mask])
        den = max(np.linalg.norm(t[:, mask]), 1e-30)
        out[h] = float(num / den)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", type=str, required=True)
    ap.add_argument("--cells", type=int, nargs=3, default=(192, 8, 8))
    ap.add_argument("--tube", type=int, nargs=3, default=None,
                    help="n_r n_theta n_z: use the periodic tube instead "
                         "of the beam")
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--steps", type=int, default=200_000)
    ap.add_argument("--pmethod", type=str, default="box")
    ap.add_argument("--fint", type=str, default="stencil")
    ap.add_argument("--exchange", type=str, default="grid")
    ap.add_argument("--ranks", type=int, default=8,
                    help="evaluate this many ranks (widest-interface "
                         "first; training is stacked over ALL ranks)")
    ap.add_argument("--variants", type=str,
                    default="base,incr,noise,rollout,combo,interface")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--n-past", type=int, default=None)
    ap.add_argument("--n-future", type=int, default=None)
    ap.add_argument("--filter-size", type=int, default=None)
    ap.add_argument("--hidden", type=int, default=None)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--rollout", type=int, default=4)
    ap.add_argument("--horizons", type=int, nargs="+", default=(1, 5, 16))
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.io.artifacts import load_displacement
    from savtpu.models.data import scale_to_zero_one
    from savtpu.models.training import fit_stacked
    from savtpu.pipeline import data_prepare, shared_extraction
    from savtpu.pipeline.common import build_context
    from savtpu.pipeline.model_training import effective_filter

    out = Path(args.dir)
    cfg = Config()
    if args.tube:
        from savtpu.mesh import tube_mesh, write_msh

        n_r, n_t, n_z = args.tube
        out.mkdir(parents=True, exist_ok=True)
        mpath = out / "tube.msh"
        write_msh(mpath, tube_mesh(n_r=n_r, n_theta=n_t, n_z=n_z))
        cfg.mesh_path = str(mpath)
        cfg.partition.dirichlet_axis = 2
    else:
        nx, ny, nz = args.cells
        cfg.beam_cells = (nx, ny, nz)
        cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    cfg.workdir = str(out / "Results")
    cfg.model_dir = str(out / "Distributed_save")
    cfg.partition.n_parts = args.parts
    cfg.partition.method = args.pmethod
    cfg.solver.num_steps = args.steps
    cfg.solver.compensated = True
    cfg.solver.fint_mode = args.fint
    cfg.solver.exchange_mode = args.exchange
    cfg.solver.save_every = math.gcd(
        args.steps, cfg.surrogate.filter_size
    )
    cfg.surrogate.stacked = True
    cfg.surrogate.scale_mode = "per_feature"
    if args.filter_size:
        cfg.surrogate.filter_size = args.filter_size
    if args.n_past:
        cfg.surrogate.n_past = args.n_past
    if args.n_future:
        cfg.surrogate.n_future = args.n_future
    if args.hidden:
        cfg.surrogate.hidden_size = args.hidden
    cfg.solver.save_every = math.gcd(
        args.steps, cfg.surrogate.filter_size
    )

    ctx = build_context(cfg, dtype=jnp.float32)
    store = ctx.store
    have = all(
        Path(store.shared_dof_h5(r)).exists()
        for r in range(args.parts)
    )
    if not have:
        t0 = time.time()
        data_prepare.run(cfg, ctx=ctx)
        shared_extraction.run(cfg)
        print(f"[ablation] stages 1-2 in {time.time()-t0:.0f}s",
              flush=True)

    maps = ctx.maps
    sur = cfg.surrogate
    eff = effective_filter(cfg)
    if args.epochs:
        sur.num_epochs = args.epochs

    # ---- load traces, build the coarse-grid scaled sequences ----------
    traces = [
        np.asarray(load_displacement(store.shared_dof_h5(r))).T
        for r in range(args.parts)
    ]
    dims = [t.shape[1] for t in traces]
    # widest interfaces drift worst; evaluate those + the global metric
    eval_ranks = list(np.argsort(dims)[::-1][: args.ranks])

    def stack_windows(groups):
        """groups: list of trace slices (T, d) -> stacked padded arrays
        for fit_stacked + per-group scale span / fmask / scaled coarse
        sequence. Follows _run_stacked's convention exactly: scaling
        constants from the phase-0 training windows, pad raw to Dmax,
        then scale the PADDED arrays (pads get (0, -1) -> stay 0)."""
        from savtpu.pipeline.model_training import _phase_windows

        per_feature = sur.scale_mode == "per_feature"
        Dmax = max(g.shape[1] for g in groups)
        Xs, Ys, smaxs, smins = [], [], [], []
        for tr in groups:
            X, Y, X0, Y0 = _phase_windows(tr, sur, eff)
            _, _, smax, smin = scale_to_zero_one(
                X0, Y0, mode=sur.scale_mode
            )
            if per_feature:
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
        n_fut = Ys[0].shape[1]
        Xp = np.zeros((len(groups), G, sur.n_past, Dmax))
        Yp = np.zeros((len(groups), G, n_fut, Dmax))
        fm = np.zeros((len(groups), Dmax))
        seqs, spans = [], []
        for i, tr in enumerate(groups):
            d = tr.shape[1]
            Xp[i, :, :, :d] = Xs[i][:G]
            Yp[i, :, :, :d] = Ys[i][:G]
            Xp[i] = (Xp[i] - smaxs[i]) / (smaxs[i] - smins[i])
            Yp[i] = (Yp[i] - smaxs[i]) / (smaxs[i] - smins[i])
            fm[i, :d] = 1.0
            trp = np.zeros((len(tr), Dmax))
            trp[:, :d] = tr
            s = (trp - smaxs[i]) / (
                np.asarray(smaxs[i]) - np.asarray(smins[i])
            )
            seqs.append(s[::eff])
            spans.append(
                np.asarray(smaxs[i], dtype=float)
                - np.asarray(smins[i], dtype=float)
            )
        return Xp, Yp, fm, spans, seqs, Dmax

    variants = args.variants.split(",")
    results = {}
    for name in variants:
        v = type(sur)(**{
            f: getattr(sur, f) for f in sur.__dataclass_fields__
        })
        v.rollout_windows = 1
        if name in ("incr", "combo"):
            v.target_mode = "increment"
        if name in ("noise", "combo"):
            v.input_noise = args.noise
        if name in ("rollout", "combo"):
            v.rollout_windows = args.rollout
        groups = [traces[r] for r in range(args.parts)]
        labels = [(r, None) for r in range(args.parts)]
        if name == "interface":
            groups, labels = [], []
            for r in range(args.parts):
                for gi, ch in enumerate(_interface_groups(maps, r)):
                    groups.append(traces[r][:, ch])
                    labels.append((r, gi))
        X, Y, fm, spans, seqs, Dmax = stack_windows(groups)
        t0 = time.time()
        params, hist = fit_stacked(v, X, Y, fm, log_every=0)
        t_train = time.time() - t0
        # per-model chained rollout from the CUTOFF boundary: encoder
        # input is the last n_past true rows of the training portion;
        # every later window sees only model output (the online regime,
        # extrapolating into the held-out tail)
        rows = {}
        for i, (r, gi) in enumerate(labels):
            if r not in eval_ranks:
                continue
            p_i = jax.tree.map(lambda a: a[i], params)
            c0 = int(sur.cut_off * len(groups[i])) // eff
            seq_tail = seqs[i][max(c0 - sur.n_past, 0):]
            rel = _chained_rollout_rel_l2(
                p_i, fm[i], seq_tail, v, args.horizons, spans[i],
            )
            rows.setdefault(r, []).append(rel)
        # combine interface groups per rank: energy-weighted rel-L2 is
        # approximated by the max (worst interface dominates the online
        # overwrite); also record the mean
        per_rank = {
            int(r): {
                str(h): max(g[h] for g in gs) for h in args.horizons
            }
            for r, gs in rows.items()
        }
        results[name] = {
            "train_seconds": round(t_train, 1),
            "models": len(groups),
            "final_train_mse": float(np.asarray(
                hist["train_loss"])[-1].mean()),
            "per_rank_rel_l2": per_rank,
            "worst": {
                str(h): max(v2[str(h)] for v2 in per_rank.values())
                for h in args.horizons
            },
            "mean": {
                str(h): float(np.mean(
                    [v2[str(h)] for v2 in per_rank.values()]
                ))
                for h in args.horizons
            },
        }
        print(f"[ablation] {name}: worst={results[name]['worst']} "
              f"mean={results[name]['mean']} ({t_train:.0f}s)",
              flush=True)
        # write after EVERY variant: a deadline/timeout kill mid-run
        # must not lose the rows already measured
        outp = out / "lstm_ablation.json"
        outp.write_text(json.dumps(
            {"config": {"cells": args.cells, "tube": args.tube,
                        "parts": args.parts, "steps": args.steps,
                        "noise": args.noise, "rollout": args.rollout,
                        "horizons": list(args.horizons),
                        "eval_ranks": [int(r) for r in eval_ranks]},
             "results": results}, indent=2))
    print(f"[ablation] wrote {outp}")


if __name__ == "__main__":
    main()
