"""Mesh partitioning (host-side, setup-time).

The reference delegates k-way element partitioning to ParMETIS via mgmetis
(Data_prepare.py:85-94) — a native C library invoked once at setup. Here we
provide our own partitioners:

- ``rcb``   — recursive coordinate bisection on element centroids (default:
              perfectly balanced, contiguous, minimal interface on elongated
              geometries like the cantilever).
- ``slab``  — 1-D contiguous split along the longest axis.
- ``graph`` — k-way greedy graph growing on the face-adjacency dual graph
              with boundary refinement; uses the native C++ kernel
              (savtpu/native) when built, else the NumPy fallback.

All return ``epart``: (E,) int array of element -> part assignments, the
same contract as ParMETIS' output.
"""

from __future__ import annotations

import numpy as np


def dual_graph(cells: np.ndarray):
    """Element face-adjacency (CSR): tets sharing a triangular face.

    Returns (xadj (E+1,), adjncy) like METIS' mesh-to-dual conversion."""
    cells = np.asarray(cells)
    E = len(cells)
    faces = np.concatenate(
        [
            cells[:, [0, 1, 2]],
            cells[:, [0, 1, 3]],
            cells[:, [0, 2, 3]],
            cells[:, [1, 2, 3]],
        ]
    )
    owner = np.tile(np.arange(E), 4)
    key = np.sort(faces, axis=1)
    order = np.lexsort((key[:, 2], key[:, 1], key[:, 0]))
    key, owner = key[order], owner[order]
    same = np.all(key[1:] == key[:-1], axis=1)
    a, b = owner[:-1][same], owner[1:][same]
    pairs = np.concatenate([np.stack([a, b], 1), np.stack([b, a], 1)])
    pairs = pairs[np.lexsort((pairs[:, 1], pairs[:, 0]))]
    xadj = np.zeros(E + 1, dtype=np.int64)
    np.add.at(xadj, pairs[:, 0] + 1, 1)
    xadj = np.cumsum(xadj)
    return xadj, pairs[:, 1].astype(np.int64)


def partition_elements(
    cells: np.ndarray,
    points: np.ndarray,
    n_parts: int,
    method: str = "rcb",
) -> np.ndarray:
    if n_parts <= 1:
        return np.zeros(len(cells), dtype=np.int64)
    centroids = points[np.asarray(cells)[:, :4]].mean(axis=1)
    if method == "rcb":
        epart = np.zeros(len(cells), dtype=np.int64)
        _rcb(np.arange(len(cells)), centroids, 0, n_parts, epart)
        return epart
    if method == "slab":
        axis = int(np.argmax(points.max(0) - points.min(0)))
        order = np.argsort(centroids[:, axis], kind="stable")
        epart = np.zeros(len(cells), dtype=np.int64)
        for p, chunk in enumerate(np.array_split(order, n_parts)):
            epart[chunk] = p
        return epart
    if method == "graph":
        return _partition_graph(cells, centroids, n_parts)
    raise ValueError(f"unknown partition method {method!r}")


def _rcb(idx, centroids, base, k, epart):
    """Recursive coordinate bisection: split along the widest centroid axis
    into contiguous halves proportional to the sub-part counts."""
    if k == 1:
        epart[idx] = base
        return
    k1 = k // 2
    c = centroids[idx]
    axis = int(np.argmax(c.max(0) - c.min(0)))
    order = np.argsort(c[:, axis], kind="stable")
    cut = int(round(len(idx) * k1 / k))
    _rcb(idx[order[:cut]], centroids, base, k1, epart)
    _rcb(idx[order[cut:]], centroids, base + k1, k - k1, epart)


def _partition_graph(cells, centroids, n_parts):
    """Greedy graph-growing + boundary refinement on the dual graph."""
    from ..native import native_partition

    xadj, adjncy = dual_graph(cells)
    out = native_partition(xadj, adjncy, n_parts)
    if out is not None:
        return out
    return _greedy_grow(xadj, adjncy, centroids, n_parts)


def _greedy_grow(xadj, adjncy, centroids, n_parts):
    E = len(xadj) - 1
    target = E // n_parts
    epart = np.full(E, -1, dtype=np.int64)
    # seeds: spread along the dominant axis
    axis = int(np.argmax(centroids.max(0) - centroids.min(0)))
    order = np.argsort(centroids[:, axis], kind="stable")
    unassigned = set(range(E))
    for p in range(n_parts):
        size_p = target + (1 if p < E % n_parts else 0)
        seed = next(e for e in order if e in unassigned)
        frontier = [seed]
        grown = 0
        while frontier and grown < size_p:
            e = frontier.pop(0)
            if epart[e] != -1:
                continue
            epart[e] = p
            unassigned.discard(e)
            grown += 1
            for nb in adjncy[xadj[e] : xadj[e + 1]]:
                if epart[nb] == -1:
                    frontier.append(int(nb))
        # disconnected leftovers handled by the final sweep
    for e in order:
        if epart[e] == -1:
            # attach to an assigned neighbor, else smallest part
            nbs = [
                int(epart[nb])
                for nb in adjncy[xadj[e] : xadj[e + 1]]
                if epart[nb] != -1
            ]
            epart[e] = nbs[0] if nbs else int(np.argmin(np.bincount(
                epart[epart >= 0], minlength=n_parts)))
    return epart
