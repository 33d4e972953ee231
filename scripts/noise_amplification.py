"""Quantify boundary-error -> interior-error amplification in the
sync-avoiding mode.

The 8-shard diagnosis (scripts/accuracy_diagnose.py) shows ~0.5% shared
closed-loop error but 13-23% interior error. Hypothesis: the interleaved
predictions' row-to-row jitter (150 INDEPENDENT phase models) is
high-frequency boundary noise; mass-proportional damping (xi ~ alpha/2w)
leaves high-frequency interior modes undamped, so the jitter pumps them
for ~97k steps. Test: drive the comm-free solver with the TRUE shared
rows corrupted by (a) white noise and (b) low-pass noise of the SAME
amplitude, and compare interior error. If (a) >> (b), smoothing the
predictions is the lever.

Usage: python scripts/noise_amplification.py [--steps N] [--parts P]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

from savtpu.pipeline.common import resolve_cache_dir
jax.config.update("jax_compilation_cache_dir", resolve_cache_dir("auto"))

import jax.numpy as jnp
import numpy as np


def lowpass(x, width):
    """Centered moving average along axis 1 (time), reflect-padded."""
    k = np.ones(width) / width
    pad = width // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    out = np.empty_like(x)
    for p in range(x.shape[0]):
        for d in range(x.shape[2]):
            out[p, :, d] = np.convolve(xp[p, :, d], k, mode="valid")[
                : x.shape[1]
            ]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--noise", type=float, default=0.005)
    ap.add_argument("--out", type=str, default="runs/noise_amp")
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.mesh import dirichlet_nodes
    from savtpu.parallel import (
        ShardedProblem,
        build_partition_maps,
        partition_elements,
    )
    from savtpu.parallel.sharded import ShardedSolver
    from savtpu.solvers import setup_problem

    cfg = Config()
    cfg.beam_cells = (48, 4, 4)
    cfg.beam_extent = (12.0, 1.0, 1.0)
    prob = setup_problem(cfg, dtype=jnp.float32)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, args.parts, "rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(prob, maps, fint_mode="dense",
                              dtype=jnp.float32)
    solver = ShardedSolver(sp)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    T = args.steps
    se = 50

    t0 = time.time()
    (truth, shared_true), _ = solver.run_streamed(
        d0, dnl, 0.0, T, sync=True, record="all", save_every=se
    )
    print(f"exchanged reference: {time.time()-t0:.1f}s", flush=True)

    sm = np.asarray(sp.smask)[:, None, :]
    # per-entry std such that ||noise|| ~= args.noise * ||shared_true||
    std = args.noise * np.linalg.norm(shared_true) / np.sqrt(
        shared_true.size
    )
    rng = np.random.default_rng(0)
    white = rng.normal(scale=std, size=shared_true.shape) * sm
    low = lowpass(white, 151)
    low *= np.linalg.norm(white) / max(np.linalg.norm(low), 1e-30)

    # interior (non-shared, non-pad) mask
    interior = np.asarray(sp.dof_mask).astype(bool)
    for p in range(sp.n_parts):
        real = np.flatnonzero(np.asarray(sp.smask[p]))
        interior[p, np.asarray(sp.sld[p])[real]] = False

    results = {"noise_rel": args.noise, "steps": T, "parts": args.parts}
    for name, noise in (("exact", None), ("white", white), ("low", low)):
        preds = shared_true if noise is None else shared_true + noise
        t0 = time.time()
        (traj, _), _ = solver.run_streamed(
            d0, dnl, 0.0, T, sync=False,
            preds=jnp.asarray(preds, jnp.float32),
            record="traj", save_every=se,
        )
        mask = np.broadcast_to(interior[:, None, :], traj.shape)
        err = np.linalg.norm(traj[mask] - truth[mask]) / max(
            np.linalg.norm(truth[mask]), 1e-30
        )
        results[name] = {"interior_relL2": round(float(err), 5),
                         "seconds": round(time.time() - t0, 1)}
        print(f"{name}: interior relL2 = {err*100:.2f}%", flush=True)

    Path(args.out).mkdir(parents=True, exist_ok=True)
    (Path(args.out) / "summary.json").write_text(
        json.dumps(results, indent=2)
    )


if __name__ == "__main__":
    main()
