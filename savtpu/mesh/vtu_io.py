"""VTK XML UnstructuredGrid (.vtu) reader/writer — no external deps.

The reference ingests meshes through meshio (Data_prepare.py:56-62),
which accepts whatever format the user's mesher emits; modern VTK
toolchains (ParaView, meshio itself, gmsh's VTK export) write the XML
``.vtu`` flavor rather than legacy ASCII. This module covers the
encodings those tools actually produce:

- ``format="ascii"`` DataArrays,
- ``format="binary"`` inline base64 (optionally zlib-compressed via
  ``compressor="vtkZLibDataCompressor"``),
- ``format="appended"`` arrays in an ``<AppendedData>`` block with
  ``encoding="base64"`` or ``encoding="raw"`` (meshio/ParaView default),
  again optionally zlib-compressed,

with ``header_type`` UInt32/UInt64 and little-endian byte order (the
only byte order produced by the tools above; big-endian files raise).
Only the cell types the solver consumes are kept (tetra=10, triangle=5,
tetra10=24), matching the legacy reader in ``vtk_io.py``.
"""

from __future__ import annotations

import base64
import re
import zlib
from pathlib import Path
from typing import Dict

import numpy as np

from .vtk_io import _NAME_BY_CELL_TYPE, Mesh

_DTYPES = {
    "Int8": np.int8, "UInt8": np.uint8,
    "Int16": np.int16, "UInt16": np.uint16,
    "Int32": np.int32, "UInt32": np.uint32,
    "Int64": np.int64, "UInt64": np.uint64,
    "Float32": np.float32, "Float64": np.float64,
}


def read_vtu(path: str | Path) -> Mesh:
    """Parse a VTK XML UnstructuredGrid file."""
    import xml.etree.ElementTree as ET

    raw = Path(path).read_bytes()
    appended, xml_bytes = _split_appended(raw)
    root = ET.fromstring(xml_bytes)
    if root.tag != "VTKFile" or root.get("type") != "UnstructuredGrid":
        raise ValueError(f"{path}: not a VTKFile/UnstructuredGrid XML file")
    if root.get("byte_order", "LittleEndian") != "LittleEndian":
        raise ValueError(f"{path}: only LittleEndian .vtu files are supported")
    header_dtype = _DTYPES[root.get("header_type", "UInt32")]
    compressed = root.get("compressor") == "vtkZLibDataCompressor"
    if root.get("compressor") not in (None, "", "vtkZLibDataCompressor"):
        raise ValueError(f"{path}: unsupported compressor {root.get('compressor')}")

    piece = root.find("UnstructuredGrid/Piece")
    if piece is None:
        raise ValueError(f"{path}: no UnstructuredGrid/Piece element")

    def data(parent_tag: str, name: str) -> np.ndarray:
        parent = piece.find(parent_tag)
        if parent is not None:
            arrays = parent.findall("DataArray")
            for da in arrays:
                if da.get("Name") == name:
                    return _decode_array(da, appended, header_dtype, compressed, path)
            # the VTK spec does not require a Name on the Points array —
            # a <Points> element holds exactly one DataArray, so take it
            if parent_tag == "Points" and len(arrays) == 1:
                return _decode_array(arrays[0], appended, header_dtype, compressed, path)
        raise ValueError(f"{path}: missing {parent_tag}/DataArray[@Name={name!r}]")

    npts = int(piece.get("NumberOfPoints", "0"))
    points = data("Points", "Points").astype(np.float64).reshape(npts, 3)
    connectivity = data("Cells", "connectivity").astype(np.int64)
    offsets = data("Cells", "offsets").astype(np.int64)
    types = data("Cells", "types").astype(np.int64)

    cells: Dict[str, list] = {}
    start = 0
    for t, end in zip(types, offsets):
        name = _NAME_BY_CELL_TYPE.get(int(t))
        if name is not None:
            cells.setdefault(name, []).append(connectivity[start:end])
        start = int(end)
    return Mesh(
        points=points,
        cells={k: np.asarray(v, dtype=np.int32) for k, v in cells.items()},
    )


def _split_appended(raw: bytes):
    """Split off the <AppendedData> payload so the rest parses as XML.

    With encoding="raw" the payload is arbitrary bytes (invalid XML); we
    locate the block textually, cut the payload out, and return it
    separately. base64 payloads are decoded later per-offset, raw ones
    are sliced directly — both are returned as (encoding, bytes).
    """
    m = re.search(rb"<AppendedData[^>]*>", raw)
    if m is None:
        return None, raw
    enc_m = re.search(rb'encoding="([^"]+)"', m.group(0))
    encoding = (enc_m.group(1) if enc_m else b"base64").decode()
    body_start = raw.index(b"_", m.end()) + 1
    body_end = raw.rindex(b"</AppendedData>")
    payload = raw[body_start:body_end]
    xml_bytes = raw[: m.end()] + b"_</AppendedData>" + raw[body_end + len(b"</AppendedData>") :]
    if encoding == "base64":
        payload = re.sub(rb"\s", b"", payload)
    elif encoding != "raw":
        raise ValueError(f"unsupported AppendedData encoding {encoding!r}")
    return (encoding, payload), xml_bytes


def _decode_array(da, appended, header_dtype, compressed, path) -> np.ndarray:
    dtype = _DTYPES[da.get("type")]
    fmt = da.get("format", "ascii")
    ncomp = int(da.get("NumberOfComponents", "1"))
    if fmt == "ascii":
        arr = np.array((da.text or "").split(), dtype=dtype)
        return arr if ncomp == 1 else arr.reshape(-1, ncomp)
    if fmt == "binary":
        data = _unpack_b64(re.sub(r"\s", "", da.text or "").encode(),
                           header_dtype, compressed)
    elif fmt == "appended":
        if appended is None:
            raise ValueError(f"{path}: appended DataArray but no AppendedData block")
        encoding, payload = appended
        off = int(da.get("offset", "0"))
        if encoding == "raw":
            data = _unpack_raw(payload, off, header_dtype, compressed)
        else:
            data = _unpack_b64(payload[off:], header_dtype, compressed)
    else:
        raise ValueError(f"{path}: unsupported DataArray format {fmt!r}")
    arr = np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder("<")).astype(dtype)
    return arr if ncomp == 1 else arr.reshape(-1, ncomp)


def _unpack_raw(blob: bytes, off: int, header_dtype, compressed: bool) -> bytes:
    """Strip the VTK block header at byte offset ``off`` and inflate.

    Uncompressed layout: [nbytes:header][data]. Compressed:
    [nblocks][blocksize][last_blocksize][compressed_sizes...][blocks...],
    every header field of ``header_dtype``.
    """
    hsize = np.dtype(header_dtype).itemsize
    if not compressed:
        (n,) = np.frombuffer(blob[off : off + hsize], dtype=header_dtype)
        return blob[off + hsize : off + hsize + int(n)]
    nblocks = int(np.frombuffer(blob[off : off + hsize], dtype=header_dtype)[0])
    sizes = np.frombuffer(
        blob[off + 3 * hsize : off + (3 + nblocks) * hsize], dtype=header_dtype
    ).astype(np.int64)
    pos = off + (3 + nblocks) * hsize
    out = []
    for s in sizes:
        out.append(zlib.decompress(blob[pos : pos + int(s)]))
        pos += int(s)
    return b"".join(out)


def _b64_len(nbytes: int) -> int:
    return 4 * (-(-nbytes // 3))


def _unpack_b64(stream: bytes, header_dtype, compressed: bool) -> bytes:
    """Decode a base64 DataArray stream (inline ``binary`` or an
    ``appended encoding="base64"`` slice starting at the array offset).

    Uncompressed, header and data form ONE base64 stream. Compressed,
    VTK encodes the block header and the compressed payload as TWO
    concatenated base64 strings (each padded independently).
    """
    hsize = np.dtype(header_dtype).itemsize
    if not compressed:
        head = base64.b64decode(stream[: _b64_len(hsize)])
        (n,) = np.frombuffer(head[:hsize], dtype=header_dtype)
        data = base64.b64decode(stream[: _b64_len(hsize + int(n))])
        return data[hsize : hsize + int(n)]
    probe = base64.b64decode(stream[: _b64_len(3 * hsize)])
    nblocks = int(np.frombuffer(probe[:hsize], dtype=header_dtype)[0])
    header_len = _b64_len((3 + nblocks) * hsize)
    header = base64.b64decode(stream[:header_len])
    sizes = np.frombuffer(
        header[3 * hsize : (3 + nblocks) * hsize], dtype=header_dtype
    ).astype(np.int64)
    body = base64.b64decode(stream[header_len : header_len + _b64_len(int(sizes.sum()))])
    out, pos = [], 0
    for s in sizes:
        out.append(zlib.decompress(body[pos : pos + int(s)]))
        pos += int(s)
    return b"".join(out)


def write_vtu(path: str | Path, mesh: Mesh, *, compress: bool = True) -> None:
    """Write an UnstructuredGrid .vtu (appended raw, little-endian,
    UInt64 headers, optional zlib compression) — the layout ParaView
    and meshio emit, so the writer doubles as a reader test oracle."""
    order = [n for n in ("tetra", "tetra10", "triangle") if n in mesh.cells]
    type_by_name = {"triangle": 5, "tetra": 10, "tetra10": 24}
    conn = np.concatenate(
        [mesh.cells[n].astype(np.int64).ravel() for n in order]
    ) if order else np.zeros(0, np.int64)
    counts = np.concatenate(
        [np.full(len(mesh.cells[n]), mesh.cells[n].shape[1], np.int64) for n in order]
    ) if order else np.zeros(0, np.int64)
    offsets = np.cumsum(counts)
    types = np.concatenate(
        [np.full(len(mesh.cells[n]), type_by_name[n], np.uint8) for n in order]
    ) if order else np.zeros(0, np.uint8)

    arrays = [
        ("Points", "Float64", 3, np.ascontiguousarray(mesh.points, np.float64)),
        ("connectivity", "Int64", 1, conn),
        ("offsets", "Int64", 1, offsets),
        ("types", "UInt8", 1, types),
    ]
    blob = bytearray()
    offs = []
    for _, _, _, arr in arrays:
        offs.append(len(blob))
        data = arr.astype(arr.dtype.newbyteorder("<"), copy=False).tobytes()
        if compress:
            comp = zlib.compress(data)
            blob += np.array([1, len(data), len(data)], np.uint64).tobytes()
            blob += np.array([len(comp)], np.uint64).tobytes() + comp
        else:
            blob += np.array([len(data)], np.uint64).tobytes() + data

    def da(name, vtype, ncomp, off):
        comp = f' NumberOfComponents="{ncomp}"' if ncomp > 1 else ""
        return (f'<DataArray type="{vtype}" Name="{name}"{comp} '
                f'format="appended" offset="{off}"/>')

    ncells = len(types)
    comp_attr = ' compressor="vtkZLibDataCompressor"' if compress else ""
    xml = (
        f'<VTKFile type="UnstructuredGrid" version="1.0" '
        f'byte_order="LittleEndian" header_type="UInt64"{comp_attr}>\n'
        f'<UnstructuredGrid><Piece NumberOfPoints="{mesh.num_points}" '
        f'NumberOfCells="{ncells}">\n'
        f'<Points>{da("Points", "Float64", 3, offs[0])}</Points>\n'
        f'<Cells>{da("connectivity", "Int64", 1, offs[1])}'
        f'{da("offsets", "Int64", 1, offs[2])}'
        f'{da("types", "UInt8", 1, offs[3])}</Cells>\n'
        f'</Piece></UnstructuredGrid>\n<AppendedData encoding="raw">_'
    )
    with open(path, "wb") as f:
        f.write(xml.encode())
        f.write(bytes(blob))
        f.write(b"</AppendedData></VTKFile>\n")
