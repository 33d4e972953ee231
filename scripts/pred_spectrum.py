"""Decompose the REAL predictor's shared-DOF error into in-band and
out-of-band components (VERDICT r2 #1, step 2).

The transfer study (runs/noise_transfer) measured the solver's noise
gain: ~3.6x for error inside the coarse band (below 1/(2*n_s*dt)) and
~15x for error above it, both linear. The plateau theory is then

    err_global^2 ~ (G_in * eps_in)^2 + (G_out * eps_out)^2

with eps_in/eps_out the predictor's closed-loop shared-row error split by
the same low-pass filter. This script replays the exact online
prediction schedule (stacked phase-interleaved predictor, history fed
from its own predictions after warm-up — no solver in the loop) against
the TRUE shared traces of a completed run, and reports the split, the
teacher-forced split, and the truth's own out-of-band content (the
intrinsic floor of ANY band-limited predictor).

Usage: python scripts/pred_spectrum.py --run runs/scale_96 \
          --cells 96 8 8 --parts 16
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))

import jax.numpy as jnp
import numpy as np

LP_WIN = 151


def lowpass_t(x, width=LP_WIN):
    """(T, D) centered moving average along time, reflect-padded."""
    pad = width // 2
    w = 2 * pad + 1
    xp = np.concatenate([x[1 : pad + 1][::-1], x, x[-pad - 1 : -1][::-1]])
    cs = np.cumsum(xp, axis=0, dtype=np.float64)
    cs = np.concatenate([np.zeros_like(cs[:1]), cs])
    return (cs[w:] - cs[:-w]) / w


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=str, default="runs/scale_96")
    ap.add_argument("--cells", type=int, nargs=3, default=(96, 8, 8))
    ap.add_argument("--parts", type=int, default=16)
    ap.add_argument("--steps", type=int, default=100_000)
    args = ap.parse_args()
    run = Path(args.run)

    from savtpu.config import Config
    from savtpu.io.artifacts import ArtifactStore, load_params, load_params_meta
    from savtpu.models import init_seq2seq
    from savtpu.models.predictor import phase_interleaved_predict_stacked

    cfg = Config()
    nx, ny, nz = args.cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    cfg.partition.n_parts = args.parts
    cfg.solver.num_steps = args.steps
    cfg.workdir = str(run / "Results")
    cfg.model_dir = str(run / "Distributed_save")
    sur = cfg.surrogate
    store = ArtifactStore(cfg.workdir, cfg.model_dir, sur.run_tag())
    P = args.parts

    # load the trained surrogates straight from the sidecars (the stored
    # traces are save_every-strided, so the online loader's recompute
    # cross-check does not apply here)
    models = []
    for r in range(P):
        meta = load_params_meta(store.model_file(r))
        template = init_seq2seq(
            jax.random.PRNGKey(0), meta["input_size"],
            meta["hidden_size"], meta["num_layers_encoder"],
            meta["bidirectional"], dtype=jnp.float32,
        )
        params = load_params(store.model_file(r), template)
        models.append((params, np.float64(meta["scale_max"]),
                       np.float64(meta["scale_min"]),
                       int(meta["input_size"])))
    S3 = models[0][3]

    # regenerate the TRUE shared trace at FULL time resolution on device
    # (the stage-2 artifact is stride-50; the predictor's history needs
    # every step)
    from scripts.noise_transfer import build_case

    prob, sp, solver = build_case(
        (nx, ny, nz), (float(nx) / max(ny, 1), 1.0, 1.0), P
    )
    assert sp.sld.shape[1] == S3, (sp.sld.shape, S3)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    import time as _time

    t0 = _time.time()
    (_, shared_h), _ = solver.run_streamed(
        d0, dnl, 0.0, args.steps, sync=True, record="shared",
    )
    print(f"exchanged ref (full-res shared): {_time.time()-t0:.1f}s",
          flush=True)
    true = np.asarray(shared_h, np.float32)        # (P, T, S3)
    fmask = np.asarray(sp.smask, np.float32)

    stacked_params = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[m[0] for m in models]
    )
    smax_v = jnp.asarray([m[1] for m in models], jnp.float32)
    smin_v = jnp.asarray([m[2] for m in models], jnp.float32)
    fmask_d = jnp.asarray(fmask)

    W = sur.n_past * sur.filter_size
    block = sur.block_size
    n_sync = sur.i_cri + 1
    n_blocks = (args.steps - n_sync) // block

    def predict(hist):
        return np.asarray(
            phase_interleaved_predict_stacked(
                stacked_params, jnp.asarray(hist), smax_v, smin_v,
                sur.n_past, sur.n_future, sur.filter_size,
                feat_mask=fmask_d,
            )
        )

    tnorm = np.linalg.norm(true) + 1e-30

    def split(err):  # (P, T, S3) -> in-band, out-of-band rel norms
        lp = np.stack([lowpass_t(err[p]) for p in range(P)])
        hp = err - lp
        return (np.linalg.norm(lp) / tnorm, np.linalg.norm(hp) / tnorm)

    res = {"run": str(run), "parts": P, "blocks": n_blocks}

    # truth's own out-of-band content (intrinsic band-limit floor)
    lp_t = np.stack([lowpass_t(true[p]) for p in range(P)])
    res["hp_truth_rel"] = float(np.linalg.norm(true - lp_t) / tnorm)

    for mode in ("teacher", "closed"):
        hist = true[:, n_sync - W : n_sync].copy()
        err_all = np.zeros_like(true[:, n_sync:])
        for b in range(n_blocks):
            lo = n_sync + b * block
            preds = predict(hist)[:, :block]
            err_all[:, b * block : (b + 1) * block] = (
                preds - true[:, lo : lo + block]
            )
            nxt = true[:, lo : lo + block] if mode == "teacher" else preds
            hist = np.concatenate([hist, nxt], axis=1)[:, -W:]
            if b % 8 == 0:
                print(f"[{mode}] block {b}/{n_blocks}", flush=True)
        e_in, e_out = split(err_all)
        res[f"{mode}_eps"] = float(np.linalg.norm(err_all) / tnorm)
        res[f"{mode}_eps_in"] = float(e_in)
        res[f"{mode}_eps_out"] = float(e_out)
        print(
            f"[{mode}] eps={res[f'{mode}_eps']*100:.3f}% "
            f"(in-band {e_in*100:.3f}%, out {e_out*100:.3f}%)",
            flush=True,
        )
    print(f"hp(truth) = {res['hp_truth_rel']*100:.3f}%")

    out = run / "pred_spectrum.json"
    out.write_text(json.dumps(res, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
