"""Mesh partitioning (host-side, setup-time).

The reference delegates k-way element partitioning to ParMETIS via mgmetis
(Data_prepare.py:85-94) — a native C library invoked once at setup. Here we
provide our own partitioners:

- ``rcb``   — recursive coordinate bisection on element centroids (default:
              perfectly balanced, contiguous, minimal interface on elongated
              geometries like the cantilever).
- ``slab``  — 1-D contiguous split along the longest axis.
- ``graph`` — RCB seed + Fiduccia-Mattheyses boundary refinement on the
              face-adjacency dual graph (the METIS recipe); refinement only
              accepts cut-reducing moves, so graph <= RCB edge cut by
              construction. Native C++ kernel when built, vectorized NumPy
              fallback otherwise.

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
    if method == "box":
        epart = _partition_box(cells, points, n_parts)
        if epart is not None:
            return epart
        # not a structured grid / no divisible box factorization — the
        # geometric bisection is the general-mesh answer
        epart = np.zeros(len(cells), dtype=np.int64)
        _rcb(np.arange(len(cells)), centroids, 0, n_parts, epart)
        return epart
    raise ValueError(f"unknown partition method {method!r}")


def _partition_box(cells, points, n_parts):
    """Equal-box grid partition of a structured Kuhn-tet mesh: factor
    n_parts into (px, py, pz) dividing the cell grid with minimal
    internal interface area. Every part is a full congruent box — the
    layout the stencil Neo-Hookean kernel (parallel/stencil.py) needs,
    and a strictly smaller cut than 1-D slabs at equal part count.
    Returns None when the mesh is not the structured grid or no
    divisible factorization exists (caller falls back to RCB)."""
    from types import SimpleNamespace

    from . import stencil

    ns = SimpleNamespace(
        tetra=np.asarray(cells), points=np.asarray(points)
    )
    s = stencil.detect_structured(ns)
    wrap_y = False
    if s is not None:
        nx, ny, nz, _ = s
    else:
        c = stencil.detect_curvilinear(ns)
        if c is None:
            return None
        nx, ny, nz = c
        wrap_y = True  # y = theta is periodic: py>1 cuts py interfaces
    best = None
    for px in range(1, n_parts + 1):
        if n_parts % px or nx % px:
            continue
        rest = n_parts // px
        for py in range(1, rest + 1):
            if rest % py or ny % py:
                continue
            pz = rest // py
            if nz % pz:
                continue
            y_cuts = py if (wrap_y and py > 1) else py - 1
            area = (
                (px - 1) * ny * nz
                + y_cuts * nx * nz
                + (pz - 1) * nx * ny
            )
            if best is None or area < best[0]:
                best = (area, px, py, pz)
    if best is None:
        return None
    _, px, py, pz = best
    bx, by, bz = nx // px, ny // py, nz // pz
    cid = np.arange(nx * ny * nz, dtype=np.int64)
    iz = cid % nz
    iy = (cid // nz) % ny
    ix = cid // (ny * nz)
    part_of_cell = ((ix // bx) * py + iy // by) * pz + iz // bz
    return np.repeat(part_of_cell, 6)  # 6 Kuhn tets per hex, cell-major


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
    """RCB seed + Fiduccia-Mattheyses boundary refinement on the dual
    graph (the METIS recipe: good initial partition, then gain moves).
    Refinement only accepts cut-reducing moves under a balance cap, so the
    result's edge cut is never worse than RCB's."""
    from ..native import native_refine

    xadj, adjncy = dual_graph(cells)
    seed = np.zeros(len(cells), dtype=np.int64)
    _rcb(np.arange(len(cells)), centroids, 0, n_parts, seed)
    out = native_refine(xadj, adjncy, seed, n_parts, refine_passes=12)
    if out is not None:
        return out
    return _refine_numpy(xadj, adjncy, seed, n_parts)


def _refine_numpy(xadj, adjncy, epart, n_parts, passes=12):
    """Vectorized FM-style refinement fallback: per pass, compute every
    boundary vertex's best-gain destination with grouped counting, then
    apply moves in descending gain order under the balance cap."""
    E = len(xadj) - 1
    epart = epart.copy()
    src = np.repeat(np.arange(E), np.diff(xadj))
    max_size = -(-E // n_parts) + 1
    for _ in range(passes):
        pairs = src * np.int64(n_parts) + epart[adjncy]
        uniq, cnts = np.unique(pairs, return_counts=True)
        uv = uniq // n_parts
        up = uniq % n_parts
        own = np.zeros(E, dtype=np.int64)
        own_mask = up == epart[uv]
        own[uv[own_mask]] = cnts[own_mask]
        # best foreign-part count per vertex
        fv, fp, fc = uv[~own_mask], up[~own_mask], cnts[~own_mask]
        if not len(fv):
            break
        order = np.lexsort((fc, fv))
        fv, fp, fc = fv[order], fp[order], fc[order]
        last = np.flatnonzero(np.diff(np.append(fv, -1)) != 0)
        bv, bp, bc = fv[last], fp[last], fc[last]
        gain = bc - own[bv]
        cand = gain > 0
        bv, bp, gain = bv[cand], bp[cand], gain[cand]
        if not len(bv):
            break
        sizes = np.bincount(epart, minlength=n_parts)
        moved = 0
        for i in np.argsort(-gain):
            v, b = int(bv[i]), int(bp[i])
            pv = int(epart[v])
            if sizes[pv] <= 1 or sizes[b] >= max_size:
                continue
            epart[v] = b
            sizes[pv] -= 1
            sizes[b] += 1
            moved += 1
        if moved == 0:
            break
    return epart


