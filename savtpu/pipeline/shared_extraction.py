"""Stage 2: extract shared-DOF displacement traces.

Equivalent of Shared_extraction.py: per rank, map the shared global node
ids to local ids to DOFs using only the stage-1 CSV artifacts, slice the
saved displacement history rows, and save the (3*|shared|, T) trace.
"""

from __future__ import annotations

import argparse

import numpy as np

from ..config import Config
from ..io.artifacts import ArtifactStore, load_displacement, save_displacement


def shared_dof_indices(local_nodes: np.ndarray, shared: np.ndarray) -> np.ndarray:
    """Interleaved DOF rows of the shared nodes inside the local DOF vector
    (node_to_dof(3, [0,1,2], local_mat_node(...)), Shared_extraction.py:27)."""
    lookup = {int(g): i for i, g in enumerate(local_nodes)}
    loc = np.array([lookup[int(g)] for g in shared], dtype=np.int64)
    return (3 * loc[:, None] + np.arange(3)[None, :]).reshape(-1)


def _extract_one(paths):
    """One rank's extraction; module-level so a process pool can run it
    (the per-rank cost is gzip decompress + compress inside HDF5, which
    serializes under h5py's global lock — processes, not threads)."""
    local_csv, shared_csv, dyn_h5, out_h5 = paths
    local_nodes = np.atleast_1d(
        np.genfromtxt(local_csv, delimiter=",").astype(np.int64)
    )
    shared = np.atleast_1d(
        np.genfromtxt(shared_csv, delimiter=",").astype(np.int64)
    )
    data = load_displacement(dyn_h5)
    rows = shared_dof_indices(local_nodes, shared)
    save_displacement(out_h5, data[rows, :])
    return len(rows)


def run(cfg: Config, n_parts: int | None = None):
    import os
    from concurrent.futures import ProcessPoolExecutor

    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_parts = n_parts or cfg.partition.n_parts
    jobs = [
        (
            str(store.local_nodes_csv(r)),
            str(store.shared_csv(r)),
            str(store.dynamics_h5(r)),
            str(store.shared_dof_h5(r)),
        )
        for r in range(n_parts)
    ]
    workers = max(1, min(8, os.cpu_count() or 1, n_parts))
    if workers > 1:
        try:
            with ProcessPoolExecutor(max_workers=workers) as ex:
                sizes = list(ex.map(_extract_one, jobs))
        except (OSError, RuntimeError):  # constrained environments
            sizes = [_extract_one(j) for j in jobs]
    else:
        sizes = [_extract_one(j) for j in jobs]

    from ..utils import stage_log

    stage_log(cfg).log(
        "stage2_extract", ranks=n_parts, shared_dofs_per_rank=sizes
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description="savtpu stage 2: shared extraction")
    ap.add_argument("--config", type=str, default=None)
    args = ap.parse_args(argv)
    cfg = Config.from_json(args.config) if args.config else Config()
    run(cfg)


if __name__ == "__main__":
    main()
