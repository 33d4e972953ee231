"""End-to-end pipeline runner: the reference's 4-stage mpirun workflow
(README.md:31-38) as one command:

    python -m savtpu.pipeline.run_all [--config cfg.json] [--steps N] ...

Stages: data_prepare -> shared_extraction -> model_training ->
online_predictor -> plotter.
"""

from __future__ import annotations

import argparse

from ..config import Config
from . import (
    data_prepare,
    model_training,
    online_predictor,
    plotter,
    shared_extraction,
)
from .common import build_context


def run(cfg: Config, verbose: bool = True):
    ctx = build_context(cfg)
    data_prepare.run(cfg, ctx=ctx, verbose=verbose)
    shared_extraction.run(cfg)
    model_training.run(cfg, verbose=verbose)
    online_predictor.run(cfg, ctx=ctx, verbose=verbose)
    return plotter.run(cfg, verbose=verbose)


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu full pipeline")
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--parts", type=int, default=None)
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    if args.steps:
        cfg.solver.num_steps = args.steps
    if args.parts:
        cfg.partition.n_parts = args.parts
    if args.epochs:
        cfg.surrogate.num_epochs = args.epochs
    run(cfg)


if __name__ == "__main__":
    main()
