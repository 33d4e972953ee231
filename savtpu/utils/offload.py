"""Threaded device-to-host trajectory offload.

The recorded-trajectory D2H copy is a first-class cost of the streamed
runners over a remote device link: at 384^3/256 the stage-4 fetch was
714 s of a 1670 s wall (docs/STATUS_r4.md #8). The link is
stream-limited, not request-limited — a measured probe
(scripts/d2h_probe3.py, TPU v5e over the session tunnel) gives

    bulk np.asarray            ~14 MB/s
    8  concurrent slice fetches ~33 MB/s
    16 concurrent slice fetches ~40 MB/s  (32 streams: no further gain)

so one bulk ``np.asarray(device_array)`` leaves ~3x on the table.
``fetch_into`` splits the copy into K leading-axis chunks and fetches
them from a persistent thread pool, writing each chunk into the host
destination as it lands (fetch and host/memmap write interleave across
workers). On a local device the chunked fetch is within noise of bulk
(device slice + copy are bandwidth-bound either way), so this is safe
as the default everywhere.

The reference has no analogue — its per-rank solutions are already on
the host when MPI hands them over (Data_prepare.py saves rank-local
numpy); on an accelerator the offload IS part of the solver's wall.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

_POOL: ThreadPoolExecutor | None = None
_STREAMS = max(1, int(os.environ.get("SAVTPU_D2H_STREAMS", "16")))
# below this many bytes a single transfer's latency dominates and
# splitting only adds dispatch overhead
_MIN_CHUNK_BYTES = 4 << 20


def _pool() -> ThreadPoolExecutor:
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(
            max_workers=_STREAMS, thread_name_prefix="savtpu-d2h"
        )
    return _POOL


def fetch_into(dst, src) -> None:
    """Copy device (or host) array ``src`` into host ndarray view ``dst``
    (same shape), chunked along axis 0 across concurrent D2H streams.

    ``dst`` may be a numpy array, a view, or a memmap region; workers
    write disjoint leading-axis chunks, which is safe for all of these.
    """
    if isinstance(src, np.ndarray):
        dst[...] = src
        return
    n = src.shape[0] if src.ndim else 0
    nbytes = int(np.dtype(src.dtype).itemsize * src.size)
    k = min(_STREAMS, n, max(1, nbytes // _MIN_CHUNK_BYTES))
    if k <= 1:
        dst[...] = np.asarray(src)
        return
    bounds = np.linspace(0, n, k + 1).astype(int)

    def fetch(i: int) -> None:
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        dst[lo:hi] = np.asarray(src[lo:hi])

    # list() re-raises any worker exception
    list(_pool().map(fetch, range(k)))


def fetch(src) -> np.ndarray:
    """Threaded-chunk equivalent of ``np.asarray(device_array)``."""
    if isinstance(src, np.ndarray):
        return src
    out = np.empty(src.shape, np.dtype(src.dtype))
    fetch_into(out, src)
    return out
