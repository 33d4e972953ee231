"""Structured-box detection for the stencil Neo-Hookean force path.

The scale benchmarks run on the structured Kuhn-tet beam generator
(savtpu.mesh.generator): every hex cell is congruent and carries the same
6-tet decomposition, so on a box-aligned partition the per-element gathers
of the generic matrix-free path (deformation-gradient gather + incident
assembly gather, the two measured hot spots at 11.4 ms/step for 96x8x8/16)
collapse into *shifted dense slices* of a (NX, NY, NZ, 3) nodal grid —
zero irregular memory ops, pure VPU arithmetic. This module detects when
that layout applies:

- the mesh is exactly a uniform structured Kuhn grid with lexicographic
  node numbering (the generator's layout, verified cell-for-cell), and
- every partition owns a full box of cells, all boxes the same shape
  (true for 'slab' and for RCB on divisible beam grids).

Detection failing is not an error — the generic gather path remains the
fallback for unstructured meshes (reference capability:
/root/reference/Tools/Mat_construction.py:79-119 computes element forces
on arbitrary tet meshes; we keep that contract and add the structured
fast path on top).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from ..mesh.generator import _CORNERS, _HEX_TO_TETS
from .halo import PartitionMaps


@dataclass(frozen=True)
class BoxPartition:
    cell_dims: Tuple[int, int, int]     # global (nx, ny, nz) cells
    # cell spacing of a congruent Kuhn grid; None = curvilinear logical
    # grid (tube): per-cell geometry via cell_type_geometry instead of
    # the 48 baked type_geometry constants
    spacing: Tuple[float, float, float] | None
    node_dims: Tuple[int, int, int]     # per-part node box (equal parts)
    origins: List[Tuple[int, int, int]]  # per-part cell-box origin
    box_cells: Tuple[int, int, int] = None  # per-part cell box
    wrap_y: bool = False                # y (theta) axis is periodic
    full_ring: bool = False             # every part spans the whole ring


def detect_structured(mesh):
    """(nx, ny, nz, spacing) if ``mesh`` is exactly a uniform structured
    Kuhn-tet grid with lexicographic node ids; None otherwise."""
    tets = mesh.tetra
    pts = np.asarray(mesh.points)
    if tets is None or len(tets) == 0 or len(tets) % 6:
        return None
    xs = np.unique(pts[:, 0])
    ys = np.unique(pts[:, 1])
    zs = np.unique(pts[:, 2])
    nx, ny, nz = len(xs) - 1, len(ys) - 1, len(zs) - 1
    if min(nx, ny, nz) < 1:
        return None
    if len(pts) != (nx + 1) * (ny + 1) * (nz + 1):
        return None
    if len(tets) != 6 * nx * ny * nz:
        return None
    spacing = []
    for u in (xs, ys, zs):
        d = np.diff(u)
        if not np.allclose(d, d[0], rtol=1e-9, atol=1e-12):
            return None
        spacing.append(float(d[0]))
    # lexicographic node ids: point n must sit at grid index
    # (i, j, k) with n == (i*(ny+1) + j)*(nz+1) + k
    gi = np.rint((pts[:, 0] - xs[0]) / spacing[0]).astype(np.int64)
    gj = np.rint((pts[:, 1] - ys[0]) / spacing[1]).astype(np.int64)
    gk = np.rint((pts[:, 2] - zs[0]) / spacing[2]).astype(np.int64)
    nid = (gi * (ny + 1) + gj) * (nz + 1) + gk
    if not np.array_equal(nid, np.arange(len(pts))):
        return None
    # connectivity must be the generator's Kuhn pattern, cell for cell
    I, J, K = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    base = np.stack([I.ravel(), J.ravel(), K.ravel()], axis=1)
    corners = (
        (base[:, None, 0] + _CORNERS[None, :, 0]) * (ny + 1)
        + (base[:, None, 1] + _CORNERS[None, :, 1])
    ) * (nz + 1) + (base[:, None, 2] + _CORNERS[None, :, 2])
    expected = corners[:, _HEX_TO_TETS].reshape(-1, 4)
    if not np.array_equal(np.asarray(tets, dtype=np.int64), expected):
        return None
    return nx, ny, nz, tuple(spacing)


def detect_curvilinear(mesh):
    """(nx, ny, nz) cell dims if ``mesh`` is exactly the structured
    annular-tube Kuhn grid of :func:`savtpu.mesh.generator.tube_mesh`
    (cylindrical product grid, theta-periodic, z-axis aligned, node id
    (i*ny + j)*(nz+1) + k over (r, theta, z) indices); None otherwise.

    Axis convention: x = radial layers (nx cells), y = theta (ny cells,
    PERIODIC — ny node columns, not ny+1), z = axial (nz cells)."""
    tets = mesh.tetra
    pts = np.asarray(mesh.points)
    if tets is None or len(tets) == 0 or len(tets) % 6:
        return None
    r = np.hypot(pts[:, 0], pts[:, 1])
    z = pts[:, 2]
    rs = _levels(r)
    zs = _levels(z)
    if rs is None or zs is None:
        return None
    nx, nz = len(rs) - 1, len(zs) - 1
    if nx < 1 or nz < 1:
        return None
    den = (nx + 1) * (nz + 1)
    ny = len(pts) // den
    if ny < 3 or ny * den != len(pts):
        return None
    if len(tets) != 6 * nx * ny * nz:
        return None
    step = 2.0 * np.pi / ny
    th = np.mod(np.arctan2(pts[:, 1], pts[:, 0]), 2.0 * np.pi)
    gj = np.rint(th / step).astype(np.int64)
    if not np.allclose(th, gj * step, atol=1e-9 + 1e-6 * step):
        return None
    gj %= ny
    gi = _level_index(r, rs)
    gk = _level_index(z, zs)
    if gi is None or gk is None:
        return None
    nid = (gi * ny + gj) * (nz + 1) + gk
    if not np.array_equal(nid, np.arange(len(pts))):
        return None
    # connectivity must be the tube generator's Kuhn pattern (theta wraps)
    I, J, K = np.meshgrid(
        np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
    )
    base = np.stack([I.ravel(), J.ravel(), K.ravel()], axis=1)
    jw = (base[:, None, 1] + _CORNERS[None, :, 1]) % ny
    corners = (
        (base[:, None, 0] + _CORNERS[None, :, 0]) * ny + jw
    ) * (nz + 1) + (base[:, None, 2] + _CORNERS[None, :, 2])
    expected = corners[:, _HEX_TO_TETS].reshape(-1, 4)
    if not np.array_equal(np.asarray(tets, dtype=np.int64), expected):
        return None
    return nx, ny, nz


def _levels(v, rtol=1e-8):
    """Sorted distinct values of ``v`` under a scaled tolerance, or None
    if they do not quantize cleanly (not a product grid)."""
    u = np.unique(v)
    scale = max(abs(float(u[0])), abs(float(u[-1])), 1e-30)
    tol = scale * rtol + 1e-12
    lev = [u[0]]
    for x in u[1:]:
        if x - lev[-1] > tol:
            lev.append(x)
    lev = np.asarray(lev)
    if len(lev) > 1 and np.min(np.diff(lev)) < 4 * tol:
        return None  # levels not separated: quantization is ambiguous
    return lev


def _level_index(v, lev):
    """Index of each value of ``v`` in the level array, or None if any
    value is not (close to) a level."""
    i = np.clip(np.searchsorted(lev, v), 0, len(lev) - 1)
    j = np.maximum(i - 1, 0)
    use_j = np.abs(lev[j] - v) < np.abs(lev[i] - v)
    idx = np.where(use_j, j, i)
    scale = max(abs(float(lev[0])), abs(float(lev[-1])), 1e-30)
    if not np.allclose(lev[idx], v, rtol=0, atol=scale * 1e-8 + 1e-12):
        return None
    return idx


def detect_box_partition(mesh, maps: PartitionMaps):
    """BoxPartition if every part owns a full, equal-shaped box of cells
    of a logically structured mesh (congruent beam grid OR the periodic
    tube); None otherwise (generic gather path applies).

    Tube specifics: y is the periodic theta axis. Parts must not
    straddle the seam (the box partitioner never wraps ranges) — unless
    one part spans the WHOLE ring (``full_ring``), which the stencil
    kernels handle with a wrapped corner column."""
    s = detect_structured(mesh)
    wrap_y = False
    if s is not None:
        nx, ny, nz, spacing = s
    else:
        c = detect_curvilinear(mesh)
        if c is None:
            return None
        nx, ny, nz = c
        spacing = None
        wrap_y = True
    node_dims = None
    box_cells = None
    origins = []
    for p in range(maps.n_parts):
        elems = np.sort(np.asarray(maps.local_elements[p]))
        if len(elems) == 0 or len(elems) % 6:
            return None
        cells = elems.reshape(-1, 6)
        if not (cells % 6 == np.arange(6)).all():
            return None  # partial cells
        cid = cells[:, 0] // 6
        iz = cid % nz
        iy = (cid // nz) % ny
        ix = cid // (ny * nz)
        x0, y0, z0 = int(ix.min()), int(iy.min()), int(iz.min())
        bx = int(ix.max()) - x0 + 1
        by = int(iy.max()) - y0 + 1
        bz = int(iz.max()) - z0 + 1
        if len(cid) != bx * by * bz:
            return None
        expect = (
            (np.arange(x0, x0 + bx)[:, None, None] * ny
             + np.arange(y0, y0 + by)[None, :, None]) * nz
            + np.arange(z0, z0 + bz)[None, None, :]
        ).ravel()
        if not np.array_equal(cid, expect):  # cid is sorted by construction
            return None
        # node box: the periodic axis has ny node columns (not ny+1), so
        # a full-ring part's y node extent is by, every other case by+1
        ring = wrap_y and by == ny
        nd = (bx + 1, by if ring else by + 1, bz + 1)
        bc = (bx, by, bz)
        if node_dims is None:
            node_dims, box_cells = nd, bc
        elif node_dims != nd or box_cells != bc:
            return None  # unequal boxes cannot stack; fallback
        origins.append((x0, y0, z0))
    return BoxPartition(
        cell_dims=(nx, ny, nz),
        spacing=spacing,
        node_dims=node_dims,
        origins=origins,
        box_cells=box_cells,
        wrap_y=wrap_y,
        full_ring=wrap_y and box_cells[1] == ny,
    )


def lex_reorder_maps(
    maps: PartitionMaps, box: BoxPartition | None = None
) -> PartitionMaps:
    """Reorder each part's local node list to local box-lexicographic
    order — the layout the stencil force kernel reshapes into a
    (NX, NY, NZ, 3) grid.

    On a non-periodic structured mesh (lexicographic global ids)
    restricted to a box, that is simply ascending global id. On the
    periodic tube the part whose theta range ends at the seam owns the
    wrapped global column j=0 as its HIGH local column, so local order is
    (i, (j - y0) mod ny, k) — pass ``box`` to get it. Downstream maps are
    rebuilt from the new order (same contract as halo.rcm_reorder_maps).
    """
    if box is None or not box.wrap_y:
        new_local = [np.sort(ln) for ln in maps.local_nodes]
    else:
        nx, ny, nz = box.cell_dims
        nzp = nz + 1
        new_local = []
        for p, (x0, y0, z0) in enumerate(box.origins):
            ln = np.sort(np.asarray(maps.local_nodes[p]))
            i = ln // (nzp * ny)
            j = (ln // nzp) % ny
            k = ln % nzp
            jl = (j - y0) % ny
            new_local.append(ln[np.lexsort((k, jl, i))])
    new_shared = [ln[np.isin(ln, maps.global_shared)] for ln in new_local]
    new_dirichlet = []
    for p in range(maps.n_parts):
        old_nodes = maps.local_nodes[p]
        dir_nodes = np.unique(
            old_nodes[np.asarray(maps.local_dirichlet[p]) // 3]
        )
        loc = np.flatnonzero(np.isin(new_local[p], dir_nodes))
        new_dirichlet.append(
            (3 * loc[:, None] + np.arange(3)[None, :]).reshape(-1)
        )
    return PartitionMaps(
        n_parts=maps.n_parts,
        epart=maps.epart,
        local_elements=maps.local_elements,
        local_nodes=new_local,
        shared_nodes=new_shared,
        global_shared=maps.global_shared,
        local_dirichlet=new_dirichlet,
    )


def type_geometry(spacing):
    """Per-tet-type physical shape gradients G (6, 4, 3) and detJ*w (6,)
    for one Kuhn cell of the given spacing — constant across the grid.
    Same J/G conventions as the generic nh build
    (savtpu.parallel.sharded.ShardedProblem.build)."""
    dx, dy, dz = spacing
    corners = _CORNERS.astype(np.float64) * np.array([dx, dy, dz])
    dN = np.array(
        [[-1.0, -1.0, -1.0],
         [1.0, 0.0, 0.0],
         [0.0, 1.0, 0.0],
         [0.0, 0.0, 1.0]]
    )
    G = np.zeros((6, 4, 3))
    dJw = np.zeros(6)
    for t in range(6):
        Pc = corners[_HEX_TO_TETS[t]]                   # (4, 3)
        Jm = np.einsum("ai,aj->ij", dN, Pc).T           # J[i,j]=sum dN_aj P_ai
        G[t] = dN @ np.linalg.inv(Jm)
        dJw[t] = np.linalg.det(Jm) * (1.0 / 6.0)        # 4-pt wts sum = 1/6
    return G, dJw


def cell_type_geometry(mesh, box: BoxPartition):
    """Per-part, per-cell physical shape gradients for a curvilinear
    logical grid (``box.spacing is None``): the tube's hex cells are not
    congruent (they rotate with theta and scale with r), so the 48 baked
    ``type_geometry`` constants become dense per-cell arrays — still zero
    gather/scatter in the kernel, just broadcast multiplies.

    Returns ``(Gc, dJwc)``:
      - Gc (P, 6, bxc, byc, bzc, 4, 3) float64 — physical gradients
        G = dN @ J^-1 per part/tet-type/cell (same J convention as
        type_geometry / the generic nh build);
      - dJwc (P, 6, bxc, byc, bzc) float64 — detJ * total weight.
    Cell axes along which the geometry is invariant are collapsed to 1
    (the straight tube is z-invariant: bzc == 1), cutting the kernel's
    bandwidth for the constant arrays.
    """
    pts = np.asarray(mesh.points)
    tets = np.asarray(mesh.tetra, dtype=np.int64)
    nx, ny, nz = box.cell_dims
    bx, by, bz = box.box_cells
    dN = np.array(
        [[-1.0, -1.0, -1.0],
         [1.0, 0.0, 0.0],
         [0.0, 1.0, 0.0],
         [0.0, 0.0, 1.0]]
    )
    P = len(box.origins)
    Gc = np.zeros((P, 6, bx, by, bz, 4, 3))
    dJwc = np.zeros((P, 6, bx, by, bz))
    for p, (x0, y0, z0) in enumerate(box.origins):
        cid = (
            ((x0 + np.arange(bx))[:, None, None] * ny
             + (y0 + np.arange(by))[None, :, None]) * nz
            + (z0 + np.arange(bz))[None, None, :]
        )                                              # (bx, by, bz)
        eid = 6 * cid[..., None] + np.arange(6)        # (bx, by, bz, 6)
        Pc = pts[tets[eid]]                            # (bx,by,bz,6,4,3)
        Jm = np.einsum("ai,...aj->...ji", dN, Pc)      # J[i,j]=sum dN_aj P_ai
        Gc[p] = np.moveaxis(
            np.einsum("aj,...jk->...ak", dN, np.linalg.inv(Jm)), 3, 0
        )
        dJwc[p] = np.moveaxis(np.linalg.det(Jm), 3, 0) * (1.0 / 6.0)
    # collapse invariant cell axes (axis 2=x, 3=y, 4=z of Gc)
    for ax, n in ((4, bz), (3, by), (2, bx)):
        if n > 1 and np.allclose(
            Gc, Gc.take([0], axis=ax), rtol=1e-12, atol=1e-12
        ) and np.allclose(
            dJwc, dJwc.take([0], axis=ax), rtol=1e-12, atol=1e-12
        ):
            Gc = Gc.take([0], axis=ax)
            dJwc = dJwc.take([0], axis=ax)
    return Gc, dJwc


def face_maps(node_dims, sld, smask, DL):
    """Compact shared-row <-> concatenated-face-plane index maps.

    In the lexicographic box layout (``lex_reorder_maps``) every shared
    node lies on one of the part's six box face planes, so the online
    scan can touch shared DOFs through static face slices instead of
    per-step gather/scatter. The artifact contract stays the compact
    ``sld``-ordered row (reference Shared_extraction.py semantics); these
    maps convert between the two layouts with one batched gather per
    ``save_every`` block.

    Face order (and within a face: plane-lex C order, xyz components
    innermost — matching ``ShardedProblem._faces_concat``): x=0, x=NX-1,
    y=0, y=NY-1, z=0, z=NZ-1.

    Returns ``(face_cidx, face_mask, conc_idx)``:
      - face_cidx (P, F3) int32: compact slot feeding each face slot
        (0 where the face slot is not a shared DOF);
      - face_mask (P, F3): 1.0 on face slots that are real shared DOFs;
      - conc_idx (P, 3*S_max) int32: a face slot holding each compact
        slot's value (0 on padded compact slots — mask with ``smask``).
    Raises if any shared DOF is not on a face plane (cannot happen on a
    true box partition; guards silent corruption if it ever does).
    """
    NX, NY, NZ = (int(v) for v in node_dims)
    P, S3 = sld.shape
    sld = np.asarray(sld)
    smask = np.asarray(smask)
    ar = np.arange

    def _nx(ix):
        iy, iz = np.meshgrid(ar(NY), ar(NZ), indexing="ij")
        return ((ix * NY + iy) * NZ + iz).ravel()

    def _ny(iy):
        ix, iz = np.meshgrid(ar(NX), ar(NZ), indexing="ij")
        return ((ix * NY + iy) * NZ + iz).ravel()

    def _nz(iz):
        ix, iy = np.meshgrid(ar(NX), ar(NY), indexing="ij")
        return ((ix * NY + iy) * NZ + iz).ravel()

    planes = [_nx(0), _nx(NX - 1), _ny(0), _ny(NY - 1),
              _nz(0), _nz(NZ - 1)]
    conc_dofs = np.concatenate(
        [(3 * nds[:, None] + np.arange(3)).ravel() for nds in planes]
    )
    F3 = conc_dofs.size
    face_cidx = np.zeros((P, F3), dtype=np.int32)
    face_mask = np.zeros((P, F3), dtype=np.float64)
    conc_idx = np.zeros((P, S3), dtype=np.int32)
    for p in range(P):
        cnt = int(round(smask[p].sum()))
        pos = np.full(DL, -1, dtype=np.int64)
        pos[sld[p, :cnt]] = np.arange(cnt)
        ci = pos[conc_dofs]                    # compact slot or -1
        hit = ci >= 0
        face_cidx[p, hit] = ci[hit]
        face_mask[p, hit] = 1.0
        rev = np.full(S3, -1, dtype=np.int64)
        rev[ci[hit]] = np.nonzero(hit)[0]      # any covering slot works
        if cnt and (rev[:cnt] < 0).any():
            raise AssertionError(
                "shared DOF off every box face plane — partition is not "
                "a clean box decomposition"
            )
        conc_idx[p, :cnt] = rev[:cnt]
    return face_cidx, face_mask, conc_idx
