"""D2H probe, take 3: after an explicit warm transfer, compare bulk vs
K-threaded slice fetches, 2 reps each, every measurement on fresh
device buffers (slices of distinct parents)."""

from __future__ import annotations

import concurrent.futures as cf
import time

import jax
import jax.numpy as jnp
import numpy as np

P, T, D = 256, 120, 1702
nbytes = P * T * D * 4
print(f"device={jax.devices()[0]} buffer {P}x{T}x{D} f32 = "
      f"{nbytes/1e6:.0f} MB", flush=True)

seed = [0]


def fresh():
    seed[0] += 1
    a = jax.random.normal(
        jax.random.PRNGKey(seed[0]), (P, T, D), dtype=jnp.float32
    )
    jax.block_until_ready(a)
    return a


out = np.empty((P, T, D), dtype=np.float32)

# warm the link (first transfer pays connection setup)
_ = np.asarray(fresh()[:8])
print("warmed", flush=True)


def timed(name, fn):
    for rep in range(2):
        a = fresh()
        t0 = time.perf_counter()
        fn(a)
        dt = time.perf_counter() - t0
        print(f"{name:30s} rep{rep} {dt:8.2f} s  {nbytes/1e6/dt:8.1f} MB/s",
              flush=True)


def bulk(a):
    out[:] = np.asarray(a)


def threaded(k):
    def run(a):
        bounds = np.linspace(0, P, k + 1).astype(int)

        def fetch(i):
            lo, hi = bounds[i], bounds[i + 1]
            out[lo:hi] = np.asarray(a[lo:hi])

        with cf.ThreadPoolExecutor(max_workers=k) as ex:
            list(ex.map(fetch, range(k)))

    return run


timed("bulk", bulk)
timed("threaded x4", threaded(4))
timed("threaded x8", threaded(8))
timed("threaded x16", threaded(16))
timed("threaded x32", threaded(32))
timed("bulk (again)", bulk)
