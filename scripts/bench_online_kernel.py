"""Micro-bench the band-resident ONLINE Pallas kernel at production
shapes (synthetic band/state): ms/step vs sub-chunk length Tc, to size
the per-grid-program fixed cost and pick the HBM transient budget in
ShardedProblem._online_chunk_len.

Usage: python scripts/bench_online_kernel.py [--parts 256] [--nc 7]
           [--bk 256] [--s3p 768] [--tc 100 460 900 1800]
"""

from __future__ import annotations

import argparse
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

from savtpu.ops.pallas_banded import (
    online_scan_vmem_bytes,
    pallas_online_chunk,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=256)
    ap.add_argument("--nc", type=int, default=7)
    ap.add_argument("--bk", type=int, default=256)
    ap.add_argument("--s3p", type=int, default=768)
    ap.add_argument("--se", type=int, default=20)
    ap.add_argument("--tc", type=int, nargs="+",
                    default=[100, 460, 900, 1800, 3000])
    args = ap.parse_args()

    P, nc, Bk, S3p, se = args.parts, args.nc, args.bk, args.s3p, args.se
    DLB = nc * Bk
    key = jax.random.PRNGKey(0)
    dtype = jnp.float32

    # diagonally dominant random band so the iteration stays bounded
    Kd = 1e-3 * jax.random.normal(key, (P, nc, Bk, Bk), dtype)
    eye = jnp.eye(Bk, dtype=dtype)
    Kd = Kd.at[:, :].add(eye[None, None])
    Kl = 1e-4 * jax.random.normal(key, (P, nc, Bk, Bk), dtype)
    hi = jnp.zeros((P, 1, DLB), dtype)
    lo = jnp.zeros((P, 1, DLB), dtype)
    v = jnp.zeros((P, 1, DLB), dtype)
    Fp = 1e-2 * jax.random.normal(key, (P, 1, DLB), dtype)
    lM = jnp.ones((P, 1, DLB), dtype)
    bc = jnp.ones((P, 1, DLB), dtype)
    mcol = (jnp.arange(DLB) < S3p).astype(dtype)
    mc = jnp.broadcast_to(mcol, (P, 1, DLB))
    comp = jnp.arange(DLB) % 3
    base = jnp.stack(
        [(comp == c).astype(dtype) for c in range(3)]
        + [jnp.zeros((DLB,), dtype)] * 5
    )
    csel = jnp.broadcast_to(base, (P, 8, DLB))
    sld3 = jnp.broadcast_to(
        jnp.arange(S3p, dtype=jnp.int32)[None, :, None], (P, S3p, 1)
    )
    sm3 = jnp.ones((P, S3p, 1), dtype)

    print(f"P={P} nc={nc} Bk={Bk} DLB={DLB} S3p={S3p} se={se} "
          f"band={2 * P * nc * Bk * Bk * 4 / 2**20:.0f} MiB")
    for Tc in args.tc:
        Tc -= Tc % se
        vmem = online_scan_vmem_bytes(nc, Bk, DLB, S3p, Tc, se, 4)
        if vmem > 100 * 2**20:
            print(f"Tc={Tc:5d}  skip (vmem {vmem / 2**20:.0f} MiB)")
            continue
        preds = 1e-3 * jax.random.normal(key, (P, Tc, S3p), dtype)

        # big arrays flow through jit ARGUMENTS (closure captures become
        # HLO constants — a 896 MiB constant 413s the remote compiler)
        @jax.jit
        def run(Kd, Kl, hi, lo, v, Fp, lM, bc, mc, csel, sld3, sm3,
                preds):
            return pallas_online_chunk(
                Kd, Kl, hi, lo, v, Fp, lM, bc, mc, csel, sld3, sm3,
                preds, t0_i0=(0.0, 0.0), dt=1e-4, alpha=0.5,
                ramped=1.0, save_every=se,
            )

        args = (Kd, Kl, hi, lo, v, Fp, lM, bc, mc, csel, sld3, sm3,
                preds)
        out = run(*args)
        jax.block_until_ready(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = run(*args)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        ms = best / Tc * 1e3
        print(f"Tc={Tc:5d}  vmem/part={vmem / 2**20:5.1f} MiB  "
              f"{ms:7.4f} ms/step  {1e3 / ms:7.0f} steps/s  "
              f"total {best:.2f}s")
        assert not bool(jnp.isnan(out[0]).any()), "NaN state"


if __name__ == "__main__":
    main()
