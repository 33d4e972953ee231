"""Gmsh ``.msh`` ASCII reader/writer (MSH 2.2 and 4.1).

The reference ingests arbitrary meshes through meshio
(/root/reference/Data_prepare.py:56-62) and its documented workflow
produces them with gmsh (/root/reference/README.md:44,
Mesh_info/beam_US.geo is a gmsh source). meshio is not available here, so
this module parses the two gmsh ASCII formats directly — both the legacy
2.2 layout and the entity-block 4.1 layout that current gmsh writes by
default. Supports the cell types the pipeline uses (triangle, tetra,
tetra10); other element types (points, lines, hexes) are skipped, and
node tags may be non-contiguous (both formats allow it — ids are
remapped to dense 0-based order).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np

from .vtk_io import Mesh

# gmsh element type id -> (name, nodes per element)
_GMSH_TYPES = {2: ("triangle", 3), 4: ("tetra", 4), 11: ("tetra10", 10)}
_GMSH_ID_BY_NAME = {name: tid for tid, (name, _) in _GMSH_TYPES.items()}


def read_msh(path: str | Path) -> Mesh:
    """Parse a gmsh ASCII .msh file (format 2.2 or 4.1)."""
    path = Path(path)
    sections = _split_sections(path)
    if "MeshFormat" not in sections:
        raise ValueError(f"{path}: missing $MeshFormat section")
    fmt = sections["MeshFormat"][0].split()
    version = float(fmt[0])
    if int(fmt[1]) != 0:
        raise ValueError(f"{path}: binary .msh not supported (ASCII only)")
    if version >= 4.0:
        pts, tag_to_idx = _nodes_v4(sections["Nodes"], path)
        cells = _elements_v4(sections["Elements"], tag_to_idx, path)
    elif version >= 2.0:
        pts, tag_to_idx = _nodes_v2(sections["Nodes"], path)
        cells = _elements_v2(sections["Elements"], tag_to_idx, path)
    else:
        raise ValueError(f"{path}: unsupported MSH version {version}")
    if "tetra" not in cells:
        raise ValueError(f"{path}: no tetrahedra found")
    return Mesh(points=pts, cells=cells)


def _split_sections(path: Path) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    name = None
    buf: List[str] = []
    for raw in path.read_text().splitlines():
        line = raw.strip()
        if not line:
            continue
        if line.startswith("$End"):
            if name is not None:
                out[name] = buf
            name, buf = None, []
        elif line.startswith("$"):
            name, buf = line[1:], []
        elif name is not None:
            buf.append(line)
    return out


def _dense_remap(tags: np.ndarray, path: Path):
    """Map (possibly sparse) node tags to dense 0-based indices."""
    order = np.argsort(tags, kind="stable")
    lookup = {int(tags[i]): int(pos) for pos, i in enumerate(order)}
    if len(lookup) != len(tags):
        raise ValueError(f"{path}: duplicate node tags")
    return order, lookup


def _nodes_v2(lines: List[str], path: Path):
    n = int(lines[0])
    rows = np.array(" ".join(lines[1 : 1 + n]).split(), dtype=np.float64)
    rows = rows.reshape(n, 4)
    tags = rows[:, 0].astype(np.int64)
    order, lookup = _dense_remap(tags, path)
    return rows[order, 1:4], lookup


def _elements_v2(lines: List[str], lookup, path: Path):
    n = int(lines[0])
    cells: Dict[str, List[List[int]]] = {}
    for line in lines[1 : 1 + n]:
        t = line.split()
        etype = int(t[1])
        spec = _GMSH_TYPES.get(etype)
        if spec is None:
            continue
        name, k = spec
        ntags = int(t[2])
        conn = [lookup[int(v)] for v in t[3 + ntags : 3 + ntags + k]]
        cells.setdefault(name, []).append(conn)
    return {k: np.asarray(v, dtype=np.int32) for k, v in cells.items()}


def _nodes_v4(lines: List[str], path: Path):
    it = iter(lines)
    header = next(it).split()
    n_blocks, n_nodes = int(header[0]), int(header[1])
    tags = np.empty(n_nodes, dtype=np.int64)
    pts = np.empty((n_nodes, 3), dtype=np.float64)
    pos = 0
    for _ in range(n_blocks):
        _, _, parametric, m = (int(v) for v in next(it).split())
        if parametric:
            raise ValueError(f"{path}: parametric nodes not supported")
        for i in range(m):
            tags[pos + i] = int(next(it))
        for i in range(m):
            pts[pos + i] = [float(v) for v in next(it).split()[:3]]
        pos += m
    order, lookup = _dense_remap(tags, path)
    return pts[order], lookup


def _elements_v4(lines: List[str], lookup, path: Path):
    it = iter(lines)
    n_blocks = int(next(it).split()[0])
    cells: Dict[str, List[List[int]]] = {}
    for _ in range(n_blocks):
        _, _, etype, m = (int(v) for v in next(it).split())
        spec = _GMSH_TYPES.get(etype)
        for _ in range(m):
            t = next(it).split()
            if spec is None:
                continue
            name, k = spec
            conn = [lookup[int(v)] for v in t[1 : 1 + k]]
            cells.setdefault(name, []).append(conn)
    return {k: np.asarray(v, dtype=np.int32) for k, v in cells.items()}


def write_msh(path: str | Path, mesh: Mesh) -> None:
    """Write MSH 2.2 ASCII (the format any gmsh/meshio install reads)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pts = np.asarray(mesh.points, dtype=np.float64)
    lines = ["$MeshFormat", "2.2 0 8", "$EndMeshFormat"]
    lines += ["$Nodes", str(len(pts))]
    lines += [
        f"{i + 1} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}"
        for i, p in enumerate(pts)
    ]
    lines += ["$EndNodes", "$Elements"]
    blocks = [
        (name, np.asarray(arr))
        for name, arr in mesh.cells.items()
        if name in _GMSH_ID_BY_NAME
    ]
    lines.append(str(sum(len(a) for _, a in blocks)))
    eid = 1
    for name, arr in blocks:
        tid = _GMSH_ID_BY_NAME[name]
        for row in arr:
            conn = " ".join(str(int(v) + 1) for v in row)
            lines.append(f"{eid} {tid} 2 0 0 {conn}")
            eid += 1
    lines.append("$EndElements")
    path.write_text("\n".join(lines) + "\n")


def read_mesh(path: str | Path) -> Mesh:
    """Extension-dispatching mesh reader (.vtk legacy ASCII or gmsh .msh)
    — the ingestion surface matching the reference's meshio.read call
    (Data_prepare.py:57)."""
    from .vtk_io import read_vtk
    from .vtu_io import read_vtu

    suffix = Path(path).suffix.lower()
    if suffix == ".msh":
        return read_msh(path)
    if suffix == ".vtk":
        return read_vtk(path)
    if suffix == ".vtu":
        return read_vtu(path)
    raise ValueError(
        f"{path}: unsupported mesh format '{suffix}' (supported: .vtk "
        f"legacy ASCII, .vtu XML, .msh gmsh 2.2/4.1 ASCII)"
    )
