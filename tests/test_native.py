"""Native C++ kernels: partitioner balance + refinement, first-touch."""

import numpy as np
import pytest

from savtpu.mesh import beam_mesh
from savtpu.native import get_lib, native_first_touch, native_partition
from savtpu.parallel.partition import dual_graph


pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable (no g++)"
)


def _edgecut(epart, xadj, adjncy):
    cut = 0
    for v in range(len(epart)):
        for u in adjncy[xadj[v] : xadj[v + 1]]:
            if epart[v] != epart[u]:
                cut += 1
    return cut // 2


def test_native_partition_balance_and_refinement():
    mesh = beam_mesh(20, 3, 3, extent=(20.0, 1.0, 1.0))
    xadj, adjncy = dual_graph(mesh.tetra)
    for k in (2, 4, 7):
        ep = native_partition(xadj, adjncy, k)
        counts = np.bincount(ep, minlength=k)
        assert counts.sum() == len(mesh.tetra)
        assert counts.min() > 0
        assert counts.max() <= len(mesh.tetra) // k + k
    # refinement should not worsen the cut
    raw = native_partition(xadj, adjncy, 4, refine_passes=0)
    ref = native_partition(xadj, adjncy, 4, refine_passes=8)
    assert _edgecut(ref, xadj, adjncy) <= _edgecut(raw, xadj, adjncy)


def test_native_first_touch_matches_python():
    rng = np.random.default_rng(0)
    flat = rng.integers(0, 50, size=500)
    out = native_first_touch(flat, 50)
    seen, order = set(), []
    for v in flat:
        if int(v) not in seen:
            seen.add(int(v))
            order.append(int(v))
    assert out.tolist() == order
