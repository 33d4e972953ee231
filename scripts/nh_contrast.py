"""Pure per-step contrast at the flagship config (neo-Hookean 384^3 /
256 box parts, stencil forces, grid exchange): comm-free vs exchanged
run_streamed scans with record='none' — no surrogate, no recording.

Two jobs:
  1. The flagship README row scale_demo could not produce (its stage 4
     faulted the device 4x at the first fused group dispatch): the
     measured sync-avoiding per-step contrast on the NH plant at scale.
  2. Fault isolation: this is the comm-free NH stencil scan ALONE. If it
     runs, the stage-4 fault lives in the fused group program's
     prediction machinery (in-scan closed-form eval / pred overwrite /
     trajectory stacking), not in the NH stencil kernel.

Writes runs/nh_384/pure_contrast.json.
"""

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(384, 16, 16))
    ap.add_argument("--parts", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--full-steps", type=int, default=200000,
                    help="scale the measured wall linearly to this")
    ap.add_argument("--out", type=str,
                    default="runs/nh_384/pure_contrast.json")
    args = ap.parse_args()

    from savtpu.config import Config
    from savtpu.pipeline.common import build_context

    cfg = Config()
    nx, ny, nz = args.cells
    cfg.beam_cells = (nx, ny, nz)
    cfg.beam_extent = (float(nx) / max(ny, 1), 1.0, 1.0)
    cfg.partition.n_parts = args.parts
    cfg.partition.method = "box"
    cfg.solver.num_steps = args.full_steps
    cfg.solver.fint_mode = "stencil"
    cfg.solver.exchange_mode = "grid"
    cfg.material.model = "neo_hookean"
    ctx = build_context(cfg, dtype=jnp.float32)
    sp, solver = ctx.sp, ctx.solver
    d0 = sp.localize(np.zeros(ctx.prob.ndof, np.float32))
    scale = args.full_steps / args.steps

    def timed(sync):
        (_, _), c = solver.run_streamed(
            d0, d0, 0.0, args.steps, sync=sync, record="none"
        )
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        (_, _), c = solver.run_streamed(
            d0, d0, 0.0, args.steps, sync=sync, record="none"
        )
        jax.block_until_ready(c)
        return time.perf_counter() - t0

    out = {"config": {"cells": list(args.cells), "parts": args.parts,
                      "material": "neo_hookean", "fint": "stencil",
                      "exchange": "grid", "steps_timed": args.steps,
                      "scaled_to_steps": args.full_steps},
           "device": str(jax.devices()[0])}
    for name, sync in (("commfree", False), ("exchanged", True)):
        t = timed(sync)
        out[f"pure_{name}_run_s"] = round(t * scale, 2)
        out[f"{name}_steps_per_sec"] = round(args.steps / t, 1)
        print(f"[contrast] {name}: {args.steps / t:.1f} steps/s "
              f"({t * scale:.1f} s scaled)", flush=True)
    out["commfree_over_exchanged"] = round(
        out["pure_exchanged_run_s"] / out["pure_commfree_run_s"], 3
    )
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()


