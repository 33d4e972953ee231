"""utils/offload: threaded-chunk D2H into host destinations.

The stage-4 trajectory record is written through ``fetch_into`` (see
pipeline/online_predictor.write_seg); these tests pin its contract —
bit-exact vs a bulk ``np.asarray`` for device arrays, numpy arrays,
views, and memmap regions, across chunk-count edge cases.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from savtpu.utils import offload
from savtpu.utils.offload import fetch, fetch_into


@pytest.mark.parametrize("shape", [(1, 7), (5, 3), (33, 4, 2), ()])
def test_fetch_into_device_matches_bulk(shape):
    rng = np.random.default_rng(0)
    src_host = rng.standard_normal(shape).astype(np.float32)
    src = jnp.asarray(src_host)
    dst = np.zeros(shape, np.float32)
    fetch_into(dst, src)
    np.testing.assert_array_equal(dst, src_host)


def test_fetch_into_numpy_passthrough():
    src = np.arange(12.0).reshape(3, 4)
    dst = np.empty_like(src)
    fetch_into(dst, src)
    np.testing.assert_array_equal(dst, src)


def test_fetch_into_memmap_region(tmp_path):
    mm = np.lib.format.open_memmap(
        tmp_path / "t.npy", mode="w+", dtype=np.float32, shape=(10, 6)
    )
    src = jnp.asarray(np.random.default_rng(1).random((10, 4), np.float32))
    fetch_into(mm[:, 1:5], src)
    mm.flush()
    np.testing.assert_array_equal(mm[:, 1:5], np.asarray(src))
    assert (mm[:, 0] == 0).all() and (mm[:, 5] == 0).all()


def test_fetch_forces_multiple_chunks(monkeypatch):
    # shrink the chunk floor so a small array actually splits
    monkeypatch.setattr(offload, "_MIN_CHUNK_BYTES", 64)
    src_host = np.random.default_rng(2).random((32, 5)).astype(np.float32)
    out = fetch(jnp.asarray(src_host))
    np.testing.assert_array_equal(out, src_host)


def test_fetch_returns_numpy_unchanged():
    a = np.ones((3, 3))
    assert fetch(a) is a
