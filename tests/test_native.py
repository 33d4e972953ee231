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


def test_graph_method_not_worse_than_rcb(reference_mesh_path):
    """graph = RCB seed + FM refinement (VERDICT item 8): edge cut and
    interface size must be <= RCB's on the unstructured reference mesh
    (strictly better there in practice), for both the native kernel and
    the NumPy fallback."""
    from savtpu.mesh import read_vtk
    from savtpu.parallel import build_partition_maps, partition_elements
    from savtpu.parallel.partition import _rcb, _refine_numpy, dual_graph

    mesh = read_vtk(reference_mesh_path)
    cells, points = mesh.tetra, mesh.points
    xadj, adjncy = dual_graph(cells)
    src = np.repeat(np.arange(len(cells)), np.diff(xadj))

    def cut_and_interface(epart, n_parts):
        cut = int(np.sum(epart[src] != epart[adjncy]) // 2)
        maps = build_partition_maps(
            cells, epart, len(points), np.zeros(0, dtype=np.int64)
        )
        return cut, len(maps.global_shared)

    for n_parts in (4, 8):
        ep_rcb = partition_elements(cells, points, n_parts, "rcb")
        ep_graph = partition_elements(cells, points, n_parts, "graph")
        cut_r, if_r = cut_and_interface(ep_rcb, n_parts)
        cut_g, if_g = cut_and_interface(ep_graph, n_parts)
        assert cut_g <= cut_r and if_g <= if_r
        counts = np.bincount(ep_graph, minlength=n_parts)
        assert counts.min() > 0
        assert counts.max() <= len(cells) / n_parts + 2

        # NumPy fallback refinement obeys the same guarantee
        centroids = points[cells[:, :4]].mean(axis=1)
        seed = np.zeros(len(cells), dtype=np.int64)
        _rcb(np.arange(len(cells)), centroids, 0, n_parts, seed)
        ep_np = _refine_numpy(xadj, adjncy, seed, n_parts)
        cut_n, if_n = cut_and_interface(ep_np, n_parts)
        assert cut_n <= cut_r and if_n <= if_r
