"""D2H probe, take 2: FRESH device array per strategy (jax caches the
host copy after the first transfer, so reusing one array across
strategies measures the cache, not the link)."""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=3, default=(256, 120, 1702))
    args = ap.parse_args()

    P, T, D = args.shape
    nbytes = P * T * D * 4
    print(f"device={jax.devices()[0]} buffer {P}x{T}x{D} f32 = "
          f"{nbytes/1e6:.0f} MB", flush=True)

    def fresh(seed):
        a = jax.random.normal(
            jax.random.PRNGKey(seed), (P, T, D), dtype=jnp.float32
        )
        jax.block_until_ready(a)
        return a

    out = np.empty((P, T, D), dtype=np.float32)

    def timed(name, fn, seed):
        a = fresh(seed)
        t0 = time.perf_counter()
        fn(a)
        dt = time.perf_counter() - t0
        print(f"{name:38s} {dt:8.2f} s  {nbytes/1e6/dt:8.1f} MB/s",
              flush=True)

    def async_bulk(a):
        a.copy_to_host_async()
        out[:] = np.asarray(a)

    def device_get(a):
        out[:] = jax.device_get(a)

    def async_threaded(k):
        def run(a):
            bounds = np.linspace(0, P, k + 1).astype(int)
            parts = [a[bounds[i]:bounds[i + 1]] for i in range(k)]
            jax.block_until_ready(parts)
            for p in parts:
                p.copy_to_host_async()

            def fetch(i):
                out[bounds[i]:bounds[i + 1]] = np.asarray(parts[i])

            with cf.ThreadPoolExecutor(max_workers=k) as ex:
                list(ex.map(fetch, range(k)))

        return run

    timed("copy_to_host_async + asarray", async_bulk, 1)
    timed("copy_to_host_async + asarray (2nd)", async_bulk, 2)
    timed("jax.device_get", device_get, 3)
    timed("async pre-sliced x4", async_threaded(4), 4)
    timed("bulk np.asarray", lambda a: out.__setitem__(slice(None),
          np.asarray(a)), 5)


if __name__ == "__main__":
    main()
