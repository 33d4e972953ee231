"""Probe D2H fetch strategies over the remote device link.

Stage-4's wall at 384^3/256 is dominated by the blocking D2H trajectory
fetch (714 s of 1670 s, ~10 MB/s effective — docs/STATUS_r4.md #8). This
probe measures whether the link is stream-limited: a single bulk
np.asarray vs K thread-parallel slice fetches of the same buffer, plus
copy_to_host_async. Result picks the fetch strategy for
pipeline/online_predictor.write_seg.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(256, 240, 1702))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    P, T, D = args.shape
    nbytes = P * T * D * 4
    print(f"device={jax.devices()[0]} buffer {P}x{T}x{D} f32 = "
          f"{nbytes/1e6:.0f} MB")

    key = jax.random.PRNGKey(0)
    arr = jax.random.normal(key, (P, T, D), dtype=jnp.float32)
    jax.block_until_ready(arr)
    out = np.empty((P, T, D), dtype=np.float32)

    def timed(name, fn):
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:38s} {best:8.2f} s  {nbytes/1e6/best:8.1f} MB/s")

    def bulk():
        out[:] = np.asarray(arr)

    def async_bulk():
        arr.copy_to_host_async()
        out[:] = np.asarray(arr)

    def chunked(k):
        bounds = np.linspace(0, P, k + 1).astype(int)

        def fetch(i):
            lo, hi = bounds[i], bounds[i + 1]
            out[lo:hi] = np.asarray(arr[lo:hi])

        with cf.ThreadPoolExecutor(max_workers=k) as ex:
            list(ex.map(fetch, range(k)))

    def chunked_presliced(k):
        # slices materialized as separate device arrays first (device-side
        # slice then per-buffer fetch) — avoids any host-side slice gather
        bounds = np.linspace(0, P, k + 1).astype(int)
        parts = [arr[bounds[i]:bounds[i + 1]] for i in range(k)]
        jax.block_until_ready(parts)

        def fetch(i):
            out[bounds[i]:bounds[i + 1]] = np.asarray(parts[i])

        with cf.ThreadPoolExecutor(max_workers=k) as ex:
            list(ex.map(fetch, range(k)))

    timed("bulk np.asarray", bulk)
    timed("copy_to_host_async + asarray", async_bulk)
    for k in (2, 4, 8, 16):
        timed(f"threaded x{k} (slice-on-fetch)", lambda k=k: chunked(k))
    for k in (4, 8):
        timed(f"threaded x{k} (pre-sliced)", lambda k=k: chunked_presliced(k))


if __name__ == "__main__":
    main()
