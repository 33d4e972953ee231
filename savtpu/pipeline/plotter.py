"""Stage 5: truth-vs-predicted comparison.

Equivalent of Results/plotter.py: per rank, overlay exact and modeled
displacement (dx, dy, dz) at one tracked *non-shared* node over
[start, num_steps] and write Comparison.pdf. Improvements over the
reference: the tracked node is auto-selected (most dynamic non-shared,
non-clamped local node — the reference hardcodes local ids 24/27 and
crashes by deliberate NameError if they turn out shared, plotter.py:66-68),
and a quantitative rel-L2 error over all non-shared DOFs is computed and
saved as JSON next to the figure.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np

from ..config import Config
from ..io.artifacts import ArtifactStore, load_displacement


def nonshared_dof_mask(local_nodes, shared):
    shared_set = set(int(s) for s in shared)
    keep_nodes = np.array(
        [int(g) not in shared_set for g in local_nodes], dtype=bool
    )
    return np.repeat(keep_nodes, 3)


def run(cfg: Config, n_parts: int | None = None, start: int = 2000,
        verbose: bool = True):
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_parts = n_parts or cfg.partition.n_parts

    import matplotlib

    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    fig, axes = plt.subplots(1, n_parts, figsize=(7 * n_parts, 5),
                             squeeze=False)
    metrics = {}
    for r in range(n_parts):
        exact = load_displacement(store.dynamics_h5(r)).T     # (T, 3n)
        pred = load_displacement(store.modeled_h5(r)).T
        T = min(len(exact), len(pred))
        exact, pred = exact[:T], pred[:T]
        local_nodes = store.load_int_csv(store.local_nodes_csv(r))
        shared = store.load_int_csv(store.shared_csv(r))
        keep = nonshared_dof_mask(local_nodes, shared)

        # quantitative: rel-L2 over non-shared DOFs, post-warm-up window
        win = slice(min(start, T - 1), T)
        diff = exact[win][:, keep] - pred[win][:, keep]
        err_sq = float(np.sum(diff * diff))
        ref_sq = float(np.sum(exact[win][:, keep] ** 2))
        rel = float(np.sqrt(err_sq) / max(np.sqrt(ref_sq), 1e-30))
        metrics[f"rank_{r}_rel_l2_nonshared"] = rel
        # accumulate the size-fair global metric: per-rank relative norms
        # over-weight small-amplitude shards (e.g. the wall-adjacent one,
        # whose denominator is tiny); the global rel-L2 weighs every DOF
        # by its actual amplitude
        metrics["global_rel_l2_nonshared"] = float(
            np.sqrt(
                (metrics.get("_err_sq", 0.0) + err_sq)
            ) / max(np.sqrt(metrics.get("_ref_sq", 0.0) + ref_sq), 1e-30)
        )
        metrics["_err_sq"] = metrics.get("_err_sq", 0.0) + err_sq
        metrics["_ref_sq"] = metrics.get("_ref_sq", 0.0) + ref_sq

        # tracked node: most dynamic non-shared node
        amp = np.abs(exact[win]).max(axis=0)
        amp[~keep] = -1.0
        tracked_dof = int(np.argmax(amp))
        tracked_node = tracked_dof // 3
        metrics[f"rank_{r}_tracked_local_node"] = tracked_node

        dt = None
        ax = axes[0][r]
        t_axis = np.arange(start, T)
        for c, lbl in enumerate("xyz"):
            ax.plot(t_axis, exact[start:T, 3 * tracked_node + c],
                    lw=1.4, label=f"exact d{lbl}")
            ax.plot(t_axis, pred[start:T, 3 * tracked_node + c],
                    lw=0.9, ls="--", label=f"model d{lbl}")
        ax.set_title(
            f"rank {r} (node {int(local_nodes[tracked_node])}, "
            f"relL2={rel:.2e})"
        )
        ax.set_xlabel("step")
        ax.legend(fontsize=7)

    out = Path(cfg.workdir) / "Comparison.pdf"
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    metrics.pop("_err_sq", None)
    metrics.pop("_ref_sq", None)
    (Path(cfg.workdir) / "comparison_metrics.json").write_text(
        json.dumps(metrics, indent=2)
    )
    from ..utils import stage_log

    stage_log(cfg).log("stage5_metrics", **metrics)
    if verbose:
        print(f"[plotter] wrote {out}; metrics: {metrics}")
    return metrics


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu stage 5: comparison plot")
    ap.add_argument("--config", type=str, default=None)
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    run(cfg)


if __name__ == "__main__":
    main()
