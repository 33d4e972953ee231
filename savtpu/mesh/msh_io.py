"""Gmsh ``.msh`` reader/writer (MSH 2.2 and 4.1, ASCII and binary).

The reference ingests arbitrary meshes through meshio
(/root/reference/Data_prepare.py:56-62) and its documented workflow
produces them with gmsh (/root/reference/README.md:44,
Mesh_info/beam_US.geo is a gmsh source). meshio is not available here, so
this module parses the two gmsh formats directly — both the legacy
2.2 layout and the entity-block 4.1 layout that current gmsh writes by
default, in ASCII and in binary mode (gmsh emits binary with ``-bin``
and users default to it for large meshes). Supports the cell types the
pipeline uses (triangle, tetra, tetra10); other element types (points,
lines, hexes) are skipped, and node tags may be non-contiguous (both
formats allow it — ids are remapped to dense 0-based order). Both
endiannesses are accepted (the format's embedded ``int 1`` probe).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List

import numpy as np

from .vtk_io import Mesh

# gmsh element type id -> (name, nodes per element)
_GMSH_TYPES = {2: ("triangle", 3), 4: ("tetra", 4), 11: ("tetra10", 10)}
_GMSH_ID_BY_NAME = {name: tid for tid, (name, _) in _GMSH_TYPES.items()}

# node counts for ALL standard gmsh element types (gmsh manual §9.1) —
# needed to size-skip blocks of types the pipeline does not use when the
# file is binary (ASCII blocks can be skipped line-by-line)
_GMSH_NODES_BY_ID = {
    1: 2, 2: 3, 3: 4, 4: 4, 5: 8, 6: 6, 7: 5, 8: 3, 9: 6, 10: 9,
    11: 10, 12: 27, 13: 18, 14: 14, 15: 1, 16: 8, 17: 20, 18: 15,
    19: 13, 20: 9, 21: 10, 22: 12, 23: 15, 24: 15, 25: 21, 26: 4,
    27: 5, 28: 6, 29: 20, 30: 35, 31: 56,
}


def read_msh(path: str | Path) -> Mesh:
    """Parse a gmsh .msh file (format 2.2 or 4.1, ASCII or binary)."""
    path = Path(path)
    data = path.read_bytes()
    i = data.find(b"$MeshFormat")
    if i < 0:
        raise ValueError(f"{path}: missing $MeshFormat section")
    j = data.find(b"\n", i)
    k = data.find(b"\n", j + 1)
    fmt = data[j + 1 : k].split()
    version = float(fmt[0])
    if int(fmt[1]) != 0:
        return _read_msh_binary(path, data, version, int(fmt[2]))
    sections = _split_sections(data.decode())
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


def _split_sections(text: str) -> Dict[str, List[str]]:
    out: Dict[str, List[str]] = {}
    name = None
    buf: List[str] = []
    for raw in text.splitlines():
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


# ---------------------------------------------------------------- binary

class _BinReader:
    """Sequential cursor over a binary .msh byte buffer: ASCII header
    lines interleaved with packed little/big-endian payloads, exactly as
    gmsh writes them (one section at a time, sizes taken from the
    section's own counts — never pattern-searched inside payloads)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos
        self.swap = False

    def readline(self) -> str:
        j = self.data.find(b"\n", self.pos)
        if j < 0:
            j = len(self.data)
        line = self.data[self.pos : j].decode("latin-1").strip()
        self.pos = j + 1
        return line

    def array(self, dtype, count: int) -> np.ndarray:
        dt = np.dtype(dtype)
        end = self.pos + dt.itemsize * int(count)
        if end > len(self.data):
            raise ValueError("truncated binary .msh payload")
        arr = np.frombuffer(self.data[self.pos : end], dtype=dt)
        self.pos = end
        return arr.byteswap() if self.swap else arr

    def skip_eol(self) -> None:
        while self.pos < len(self.data) and self.data[
            self.pos : self.pos + 1
        ] in (b"\n", b"\r"):
            self.pos += 1


def _read_msh_binary(path: Path, data: bytes, version: float,
                     dsize: int) -> Mesh:
    if version >= 4.0 and version < 4.1:
        raise ValueError(f"{path}: binary MSH 4.0 not supported (use 4.1)")
    size_t = {4: np.uint32, 8: np.uint64}.get(dsize)
    if size_t is None:
        raise ValueError(f"{path}: unsupported .msh data size {dsize}")
    r = _BinReader(data)
    pts = lookup = None
    cells: Dict[str, np.ndarray] = {}
    while r.pos < len(r.data):
        line = r.readline()
        if line == "$MeshFormat":
            r.readline()  # version / file-type / data-size (already parsed)
            one = r.array(np.int32, 1)
            if int(one[0]) != 1:
                r.swap = True
                if int(one.byteswap()[0]) != 1:
                    raise ValueError(f"{path}: bad endianness probe")
            r.skip_eol()
        elif line == "$Nodes":
            if version >= 4.0:
                pts, lookup = _bin_nodes_v4(r, size_t, path)
            else:
                pts, lookup = _bin_nodes_v2(r, path)
            r.skip_eol()
        elif line == "$Elements":
            if lookup is None:
                raise ValueError(f"{path}: $Elements before $Nodes")
            if version >= 4.0:
                cells = _bin_elements_v4(r, size_t, lookup, path)
            else:
                cells = _bin_elements_v2(r, lookup, path)
            r.skip_eol()
        elif line == "$Entities" and version >= 4.0:
            _bin_skip_entities(r, size_t)
            r.skip_eol()
        elif line.startswith("$") and not line.startswith("$End"):
            # unknown section ($PhysicalNames is ASCII even in binary
            # files; others are rare) — skip to its $End marker
            end = ("$End" + line[1:]).encode()
            j = r.data.find(end, r.pos)
            if j < 0:
                raise ValueError(f"{path}: unterminated ${line[1:]}")
            r.pos = j
    if pts is None or "tetra" not in cells:
        raise ValueError(f"{path}: no tetrahedra found")
    return Mesh(points=pts, cells=cells)


def _bin_nodes_v2(r: _BinReader, path: Path):
    n = int(r.readline())
    rec = np.dtype([("tag", np.int32), ("xyz", np.float64, (3,))])
    rows = r.array(rec, n)
    tags = rows["tag"].astype(np.int64)
    order, lookup = _dense_remap(tags, path)
    return np.ascontiguousarray(rows["xyz"][order]), lookup


def _bin_elements_v2(r: _BinReader, lookup, path: Path):
    n = int(r.readline())
    cells: Dict[str, List[np.ndarray]] = {}
    seen = 0
    while seen < n:
        etype, m, ntags = (int(v) for v in r.array(np.int32, 3))
        spec = _GMSH_TYPES.get(etype)
        if spec is None:
            # consume the block: m * (tag + ntags + k) int32 each
            k = _GMSH_NODES_BY_ID.get(etype)
            if k is None:
                raise ValueError(
                    f"{path}: unknown gmsh element type {etype} in binary "
                    "block (cannot size the payload to skip it)"
                )
            r.array(np.int32, m * (1 + ntags + k))
        else:
            name, k = spec
            block = r.array(np.int32, m * (1 + ntags + k))
            block = block.reshape(m, 1 + ntags + k)[:, 1 + ntags :]
            cells.setdefault(name, []).append(block)
        seen += m
    return {
        name: _remap_conn(np.concatenate(parts), lookup, path)
        for name, parts in cells.items()
    }


def _bin_nodes_v4(r: _BinReader, size_t, path: Path):
    n_blocks, n_nodes, _, _ = (int(v) for v in r.array(size_t, 4))
    tags = np.empty(n_nodes, dtype=np.int64)
    pts = np.empty((n_nodes, 3), dtype=np.float64)
    pos = 0
    for _ in range(n_blocks):
        r.array(np.int32, 3)  # entity dim / entity tag / parametric
        m = int(r.array(size_t, 1)[0])
        tags[pos : pos + m] = r.array(size_t, m).astype(np.int64)
        pts[pos : pos + m] = r.array(np.float64, 3 * m).reshape(m, 3)
        pos += m
    order, lookup = _dense_remap(tags, path)
    return pts[order], lookup


def _bin_elements_v4(r: _BinReader, size_t, lookup, path: Path):
    n_blocks = int(r.array(size_t, 4)[0])
    cells: Dict[str, List[np.ndarray]] = {}
    for _ in range(n_blocks):
        _, _, etype = (int(v) for v in r.array(np.int32, 3))
        m = int(r.array(size_t, 1)[0])
        k = _GMSH_NODES_BY_ID.get(etype)
        if k is None:
            raise ValueError(
                f"{path}: unknown gmsh element type {etype} in binary "
                "block (cannot size the payload to skip it)"
            )
        block = r.array(size_t, m * (1 + k)).reshape(m, 1 + k)
        spec = _GMSH_TYPES.get(etype)
        if spec is not None:
            cells.setdefault(spec[0], []).append(
                block[:, 1:].astype(np.int64)
            )
    return {
        name: _remap_conn(np.concatenate(parts), lookup, path)
        for name, parts in cells.items()
    }


def _bin_skip_entities(r: _BinReader, size_t) -> None:
    """Walk the v4.1 binary $Entities section by its own counts."""
    np_, nc, ns, nv = (int(v) for v in r.array(size_t, 4))
    for _ in range(np_):
        r.array(np.int32, 1)          # tag
        r.array(np.float64, 3)        # x y z
        nphys = int(r.array(size_t, 1)[0])
        r.array(np.int32, nphys)
    for count in (nc, ns, nv):
        for _ in range(count):
            r.array(np.int32, 1)      # tag
            r.array(np.float64, 6)    # bounding box
            nphys = int(r.array(size_t, 1)[0])
            r.array(np.int32, nphys)
            nbound = int(r.array(size_t, 1)[0])
            r.array(np.int32, nbound)


def _remap_conn(conn: np.ndarray, lookup, path: Path) -> np.ndarray:
    out = np.empty(conn.shape, dtype=np.int32)
    flat_in, flat_out = conn.ravel(), out.ravel()
    for i, tag in enumerate(flat_in):
        try:
            flat_out[i] = lookup[int(tag)]
        except KeyError:
            raise ValueError(f"{path}: element references unknown node "
                             f"tag {int(tag)}") from None
    return out


def write_msh(path: str | Path, mesh: Mesh, *, binary: bool = False,
              version: str = "2.2") -> None:
    """Write a .msh file: MSH 2.2 (ASCII or binary) or 4.1 binary.

    ASCII 2.2 is what any gmsh/meshio install reads; the binary modes
    exist to round-trip-test the binary readers and to emit compact
    meshes at scale."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    pts = np.asarray(mesh.points, dtype=np.float64)
    if version == "4.1":
        if not binary:
            raise ValueError("write_msh: ASCII 4.1 writing not supported "
                             "(use version='2.2' or binary=True)")
        return _write_msh41_binary(path, mesh, pts)
    if binary:
        return _write_msh22_binary(path, mesh, pts)
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


def _cell_blocks(mesh: Mesh):
    return [(name, np.asarray(arr)) for name, arr in mesh.cells.items()
            if name in _GMSH_ID_BY_NAME]


def _write_msh22_binary(path: Path, mesh: Mesh, pts: np.ndarray) -> None:
    out = [b"$MeshFormat\n2.2 1 8\n",
           np.int32(1).tobytes(), b"\n$EndMeshFormat\n"]
    rec = np.dtype([("tag", np.int32), ("xyz", np.float64, (3,))])
    rows = np.empty(len(pts), dtype=rec)
    rows["tag"] = np.arange(1, len(pts) + 1, dtype=np.int32)
    rows["xyz"] = pts
    out += [b"$Nodes\n", str(len(pts)).encode(), b"\n", rows.tobytes(),
            b"\n$EndNodes\n"]
    blocks = _cell_blocks(mesh)
    out += [b"$Elements\n",
            str(sum(len(a) for _, a in blocks)).encode(), b"\n"]
    eid = 1
    for name, arr in blocks:
        tid = _GMSH_ID_BY_NAME[name]
        m, k = arr.shape
        out.append(np.array([tid, m, 2], dtype=np.int32).tobytes())
        block = np.empty((m, 3 + k), dtype=np.int32)
        block[:, 0] = np.arange(eid, eid + m)
        block[:, 1:3] = 0  # two zero tags
        block[:, 3:] = arr + 1
        out.append(block.tobytes())
        eid += m
    out.append(b"\n$EndElements\n")
    path.write_bytes(b"".join(out))


def _write_msh41_binary(path: Path, mesh: Mesh, pts: np.ndarray) -> None:
    u8 = np.uint64
    out = [b"$MeshFormat\n4.1 1 8\n",
           np.int32(1).tobytes(), b"\n$EndMeshFormat\n"]
    # one 3-D entity holding everything (exercises the $Entities skipper)
    out += [b"$Entities\n",
            np.array([0, 0, 0, 1], dtype=u8).tobytes(),
            np.int32(1).tobytes(),           # volume tag
            np.zeros(6, dtype=np.float64).tobytes(),
            u8(0).tobytes(), u8(0).tobytes(),
            b"\n$EndEntities\n"]
    n = len(pts)
    out += [b"$Nodes\n",
            np.array([1, n, 1, n], dtype=u8).tobytes(),
            np.array([3, 1, 0], dtype=np.int32).tobytes(),
            u8(n).tobytes(),
            np.arange(1, n + 1, dtype=u8).tobytes(),
            pts.astype(np.float64).tobytes(),
            b"\n$EndNodes\n"]
    blocks = _cell_blocks(mesh)
    ntot = sum(len(a) for _, a in blocks)
    out += [b"$Elements\n",
            np.array([len(blocks), ntot, 1, ntot], dtype=u8).tobytes()]
    eid = 1
    for name, arr in blocks:
        tid = _GMSH_ID_BY_NAME[name]
        m, k = arr.shape
        out.append(np.array([3, 1, tid], dtype=np.int32).tobytes())
        out.append(u8(m).tobytes())
        block = np.empty((m, 1 + k), dtype=u8)
        block[:, 0] = np.arange(eid, eid + m)
        block[:, 1:] = arr.astype(np.int64) + 1
        out.append(block.tobytes())
        eid += m
    out.append(b"\n$EndElements\n")
    path.write_bytes(b"".join(out))


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
        f"legacy ASCII, .vtu XML, .msh gmsh 2.2/4.1 ASCII or binary)"
    )
