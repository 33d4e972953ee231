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


def run(cfg: Config, n_parts: int | None = None, verbose: bool = True):
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    sur = cfg.surrogate
    n_parts = n_parts or cfg.partition.n_parts
    results = {}
    for r in range(n_parts):
        trace = load_displacement(store.shared_dof_h5(r)).T  # (T, D)
        input_size = trace.shape[1]
        X, Y = strided_windows(
            trace, sur.n_past, sur.n_future, sur.filter_size, sur.cut_off
        )
        X, Y, smax, smin = scale_to_zero_one(X, Y)
        rng = np.random.default_rng(sur.seed + 17 * r)
        tr, va = train_val_split(len(X), sur.train_portion, rng)
        if verbose:
            print(
                f"[model_training] rank {r}: input_size={input_size}, "
                f"{len(tr)} train / {len(va)} val windows, "
                f"{sur.epochs} epochs"
            )
        log = (lambda s: print(f"[rank {r}] {s}")) if verbose else (lambda s: None)
        params, hist = fit(
            sur, X[tr], Y[tr], X[va], Y[va],
            log_every=50 if verbose else 0, log_fn=log,
        )
        store.save_training_curves(r, hist)
        save_params(
            store.model_file(r),
            params,
            meta={
                "input_size": int(input_size),
                "hidden_size": sur.hidden_size,
                "num_layers_encoder": sur.num_layers_encoder,
                "bidirectional": sur.bidirectional,
                "n_past": sur.n_past,
                "n_future": sur.n_future,
                "filter_size": sur.filter_size,
                "cut_off": sur.cut_off,
                "scale_max": float(smax),
                "scale_min": float(smin),
                "final_train_loss": hist["train_loss"][-1],
                "final_val_r2": hist["val_r2"][-1] if hist["val_r2"] else None,
            },
        )
        results[r] = (params, hist)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu stage 3: model training")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    if args.epochs:
        cfg.surrogate.num_epochs = args.epochs
    run(cfg)


if __name__ == "__main__":
    main()
