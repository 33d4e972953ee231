"""Boundary-noise -> interior-error transfer function study (VERDICT r2 #1).

Tests the surviving hypothesis for the fine-mesh accuracy plateau
(docs/STATUS_r2.md): prescribing the shared-interface DOFs with error
delta injects force K*delta; K row norms scale ~1/h^2 with refinement, so
the interior error per unit boundary error should grow with resolution —
until the damping envelope caps the response (the 192^3 saturation).

Protocol (all compensated f32 — the round-2 noise_amp run predates the
compensated integrator and its 18% "exact" baseline was pure f32
trajectory floor, swamping any spectral signal):

  for each mesh in {48x4x4/8, 96x8x8/16}:
    exchanged reference run -> truth + true shared rows
    "exact"  : comm-free run fed the true rows (closed-loop floor)
    for eps in sweep, for spectrum in {white, lowpass(151), interleave}:
        comm-free run fed true rows + noise(eps, spectrum)
        record interior global rel-L2
    T(eps, spectrum) = err / eps   (the transfer gain)

``interleave`` models the real predictor's row-to-row jitter: each of the
filter_size phase slots gets an independent, slot-constant offset per
coarse window — piecewise-constant-in-coarse-step noise that is white
ACROSS slots, matching how 150 independent models interleave.

Usage: python scripts/noise_transfer.py [--steps N] [--quick]
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def lowpass(x, width):
    """Centered moving average along axis 1 (time), reflect-padded
    (cumsum form — vectorized; the convolve loop is hours at 16 parts x
    1800 DOFs on this 1-CPU box)."""
    pad = width // 2
    w = 2 * pad + 1
    xp = np.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    cs = np.cumsum(xp, axis=1, dtype=np.float64)
    cs = np.concatenate([np.zeros_like(cs[:, :1]), cs], axis=1)
    return ((cs[:, w:] - cs[:, :-w]) / w).astype(x.dtype)


def interleave_noise(rng, shape, n_s, std, block_len=3000):
    """Phase-interleave-style jitter: each of the n_s phase slots gets an
    independent offset, constant through one refill block — the structure
    150 independent models actually produce (slot-to-slot discontinuous =
    above coarse Nyquist; smooth along each slot's own samples)."""
    P, T, D = shape
    n_b = -(-T // block_len)
    c = rng.normal(scale=std, size=(P, n_b, 1, n_s, D)).astype(np.float32)
    reps = -(-block_len // n_s)
    cells = np.broadcast_to(c, (P, n_b, reps, n_s, D))
    return cells.reshape(P, n_b * reps * n_s, D)[:, :T, :]


def build_case(cells, extent, parts, fint="auto"):
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
    cfg.beam_cells = cells
    cfg.beam_extent = extent
    prob = setup_problem(cfg, dtype=jnp.float32)
    epart = partition_elements(
        prob.mesh.tetra, prob.mesh.points, parts, "rcb"
    )
    dn_nodes = dirichlet_nodes(prob.mesh.triangles, prob.mesh.points)
    maps = build_partition_maps(
        prob.mesh.tetra, epart, prob.mesh.num_points, dn_nodes
    )
    sp = ShardedProblem.build(
        prob, maps, fint_mode=fint, dtype=jnp.float32, compensated=True
    )
    return prob, sp, ShardedSolver(sp)


def interior_mask(sp):
    interior = np.asarray(sp.dof_mask).astype(bool)
    for p in range(sp.n_parts):
        real = np.flatnonzero(np.asarray(sp.smask[p]))
        interior[p, np.asarray(sp.sld[p])[real]] = False
    return interior


def run_mesh(name, cells, extent, parts, steps, eps_sweep, n_s, out):
    prob, sp, solver = build_case(cells, extent, parts)
    d0 = sp.localize(prob.d0)
    dnl = sp.localize(prob.dn)
    se = 50

    t0 = time.time()
    (truth, shared_true), _ = solver.run_streamed(
        d0, dnl, 0.0, steps, sync=True, record="all", save_every=se
    )
    print(f"[{name}] exchanged ref: {time.time()-t0:.1f}s", flush=True)

    interior = interior_mask(sp)
    mask_b = None
    tnorm = None

    def interior_err(traj):
        nonlocal mask_b, tnorm
        if mask_b is None:
            mask_b = np.broadcast_to(interior[:, None, :], truth.shape)
            tnorm = max(np.linalg.norm(truth[mask_b]), 1e-30)
        return float(np.linalg.norm(traj[mask_b] - truth[mask_b]) / tnorm)

    def commfree(preds):
        (traj, _), _ = solver.run_streamed(
            d0, dnl, 0.0, steps, sync=False,
            preds=jnp.asarray(preds, jnp.float32),
            record="traj", save_every=se,
        )
        return traj

    sm = np.asarray(sp.smask)[:, None, :]
    shared_norm = np.linalg.norm(shared_true)
    res = {
        "mesh": name, "parts": parts, "steps": steps,
        "elements": len(prob.mesh.tetra), "ndof": prob.ndof,
        "dt": prob.dt,
        "exact": interior_err(commfree(shared_true)),
        "noise": [],
    }
    print(f"[{name}] exact (closed-loop floor): "
          f"{res['exact']*100:.3f}%", flush=True)

    rng = np.random.default_rng(0)
    for eps in eps_sweep:
        std = eps * shared_norm / np.sqrt(shared_true.size)
        white = (
            rng.normal(scale=std, size=shared_true.shape)
            .astype(np.float32) * sm
        )
        low = lowpass(white, 151)
        low *= np.linalg.norm(white) / max(np.linalg.norm(low), 1e-30)
        inter = interleave_noise(rng, shared_true.shape, n_s, std) * sm
        inter *= np.linalg.norm(white) / max(np.linalg.norm(inter), 1e-30)
        for spec, noise in (("white", white), ("low", low),
                            ("interleave", inter)):
            err = interior_err(commfree(shared_true + noise))
            gain = err / eps
            res["noise"].append(
                {"eps": eps, "spectrum": spec,
                 "interior_relL2": round(err, 6),
                 "gain": round(gain, 3)}
            )
            print(f"[{name}] eps={eps:g} {spec}: err={err*100:.3f}% "
                  f"gain={gain:.2f}", flush=True)
    out.mkdir(parents=True, exist_ok=True)
    (out / f"{name}.json").write_text(json.dumps(res, indent=2))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--out", type=str, default="runs/noise_transfer")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--mesh", type=str, default=None,
                    help="run only 'coarse' or 'fine'")
    args = ap.parse_args()
    out = Path(args.out)

    eps_sweep = [0.0025, 0.01] if args.quick else [0.00125, 0.0025,
                                                   0.005, 0.01]
    n_s = 150
    cases = {
        "coarse": ((48, 4, 4), (12.0, 1.0, 1.0), 8),
        "fine": ((96, 8, 8), (12.0, 1.0, 1.0), 16),
    }
    results = []
    for name, (cells, extent, parts) in cases.items():
        if args.mesh and name != args.mesh:
            continue
        results.append(
            run_mesh(name, cells, extent, parts, args.steps, eps_sweep,
                     n_s, out)
        )
    (out / "summary.json").write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
