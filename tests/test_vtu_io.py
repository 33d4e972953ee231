"""VTK XML (.vtu) ingestion: every encoding a real toolchain emits.

The reference reads whatever meshio can parse (Data_prepare.py:56-62);
ParaView/meshio-written tetra meshes arrive as .vtu with appended-raw
zlib payloads, while hand-exported ones are ascii or inline base64.
Each test builds the SAME small mesh through a different encoding and
requires bit-identical points/cells.
"""

import base64
import zlib

import numpy as np
import pytest

from savtpu.mesh import read_mesh, read_vtu, tube_mesh, write_vtu
from savtpu.mesh.vtk_io import Mesh


def _small_mesh() -> Mesh:
    m = tube_mesh(n_r=1, n_theta=6, n_z=2)
    return Mesh(points=m.points, cells=dict(m.cells))


def _assert_same(a: Mesh, b: Mesh):
    np.testing.assert_array_equal(a.points, b.points)
    assert set(a.cells) == set(b.cells)
    for k in a.cells:
        np.testing.assert_array_equal(a.cells[k], b.cells[k])


@pytest.mark.parametrize("compress", [True, False])
def test_write_read_roundtrip(tmp_path, compress):
    m = _small_mesh()
    p = tmp_path / "mesh.vtu"
    write_vtu(p, m, compress=compress)
    _assert_same(m, read_vtu(p))


def test_read_mesh_dispatches_vtu(tmp_path):
    m = _small_mesh()
    p = tmp_path / "mesh.vtu"
    write_vtu(p, m)
    _assert_same(m, read_mesh(p))


def _cells_flat(m: Mesh):
    type_by_name = {"triangle": 5, "tetra": 10, "tetra10": 24}
    conn, offs, types = [], [], []
    for name, arr in m.cells.items():
        for row in arr:
            conn.extend(int(v) for v in row)
            offs.append(len(conn))
            types.append(type_by_name[name])
    return conn, offs, types


def _vtu_ascii(m: Mesh) -> bytes:
    conn, offs, types = _cells_flat(m)
    pts = " ".join(repr(float(v)) for v in m.points.ravel())
    return f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian">
 <UnstructuredGrid><Piece NumberOfPoints="{m.num_points}" NumberOfCells="{len(types)}">
  <Points><DataArray type="Float64" Name="Points" NumberOfComponents="3" format="ascii">
   {pts}</DataArray></Points>
  <Cells>
   <DataArray type="Int32" Name="connectivity" format="ascii">{' '.join(map(str, conn))}</DataArray>
   <DataArray type="Int32" Name="offsets" format="ascii">{' '.join(map(str, offs))}</DataArray>
   <DataArray type="UInt8" Name="types" format="ascii">{' '.join(map(str, types))}</DataArray>
  </Cells></Piece></UnstructuredGrid></VTKFile>
""".encode()


def test_ascii(tmp_path):
    m = _small_mesh()
    p = tmp_path / "a.vtu"
    p.write_bytes(_vtu_ascii(m))
    _assert_same(m, read_vtu(p))


def test_unnamed_points_array(tmp_path):
    # the VTK spec does not require Name= on the Points DataArray; a
    # <Points> element holds exactly one array, so the reader takes it
    m = _small_mesh()
    p = tmp_path / "a.vtu"
    p.write_bytes(_vtu_ascii(m).replace(b'Name="Points" ', b""))
    _assert_same(m, read_vtu(p))


def _b64_block(data: bytes, header_dtype, compress: bool) -> bytes:
    """Encode one DataArray payload the way VTK does inline/appended-b64."""
    if not compress:
        return base64.b64encode(
            np.array([len(data)], header_dtype).tobytes() + data
        )
    comp = zlib.compress(data)
    header = np.array([1, len(data), len(data), len(comp)], header_dtype)
    # compressed: header and payload are SEPARATE base64 streams
    return base64.b64encode(header.tobytes()) + base64.b64encode(comp)


def _vtu_binary(m: Mesh, header_type: str, compress: bool,
                appended: bool) -> bytes:
    hdt = {"UInt32": np.uint32, "UInt64": np.uint64}[header_type]
    conn, offs, types = _cells_flat(m)
    arrays = [
        ("Points", "Float64", 3, np.asarray(m.points, np.float64).tobytes(), "Points"),
        ("connectivity", "Int64", 1, np.asarray(conn, np.int64).tobytes(), "Cells"),
        ("offsets", "Int64", 1, np.asarray(offs, np.int64).tobytes(), "Cells"),
        ("types", "UInt8", 1, np.asarray(types, np.uint8).tobytes(), "Cells"),
    ]
    comp_attr = ' compressor="vtkZLibDataCompressor"' if compress else ""
    blocks = {name: _b64_block(data, hdt, compress)
              for name, _, _, data, _ in arrays}
    das, blob, off = {}, b"", 0
    for name, vt, nc, _, _ in arrays:
        ncomp = f' NumberOfComponents="{nc}"' if nc > 1 else ""
        if appended:
            das[name] = (f'<DataArray type="{vt}" Name="{name}"{ncomp}'
                         f' format="appended" offset="{off}"/>')
            blob += blocks[name]
            off += len(blocks[name])
        else:
            das[name] = (f'<DataArray type="{vt}" Name="{name}"{ncomp}'
                         f' format="binary">{blocks[name].decode()}</DataArray>')
    tail = (f'<AppendedData encoding="base64">_{blob.decode()}</AppendedData>'
            if appended else "")
    return (
        f'<VTKFile type="UnstructuredGrid" version="1.0" '
        f'byte_order="LittleEndian" header_type="{header_type}"{comp_attr}>'
        f'<UnstructuredGrid><Piece NumberOfPoints="{m.num_points}" '
        f'NumberOfCells="{len(types)}">'
        f'<Points>{das["Points"]}</Points>'
        f'<Cells>{das["connectivity"]}{das["offsets"]}{das["types"]}</Cells>'
        f'</Piece></UnstructuredGrid>{tail}</VTKFile>'
    ).encode()


@pytest.mark.parametrize("header_type", ["UInt32", "UInt64"])
@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("appended", [False, True])
def test_binary_variants(tmp_path, header_type, compress, appended):
    m = _small_mesh()
    p = tmp_path / "b.vtu"
    p.write_bytes(_vtu_binary(m, header_type, compress, appended))
    _assert_same(m, read_vtu(p))


def test_unknown_cell_types_skipped(tmp_path):
    """Vertex/line/hex cells in the file must be ignored, not crash."""
    m = _small_mesh()
    conn, offs, types = _cells_flat(m)
    conn, offs, types = conn + [0], offs + [len(conn) + 1], types + [1]
    doc = f"""<VTKFile type="UnstructuredGrid" byte_order="LittleEndian">
<UnstructuredGrid><Piece NumberOfPoints="{m.num_points}" NumberOfCells="{len(types)}">
<Points><DataArray type="Float64" Name="Points" NumberOfComponents="3" format="ascii">
{' '.join(repr(float(v)) for v in m.points.ravel())}</DataArray></Points>
<Cells>
<DataArray type="Int32" Name="connectivity" format="ascii">{' '.join(map(str, conn))}</DataArray>
<DataArray type="Int32" Name="offsets" format="ascii">{' '.join(map(str, offs))}</DataArray>
<DataArray type="UInt8" Name="types" format="ascii">{' '.join(map(str, types))}</DataArray>
</Cells></Piece></UnstructuredGrid></VTKFile>"""
    p = tmp_path / "c.vtu"
    p.write_bytes(doc.encode())
    _assert_same(m, read_vtu(p))


def test_vtu_msh_vtk_agree(tmp_path):
    """The same mesh written as .vtu, .msh, and legacy .vtk reads back
    identically through the read_mesh dispatcher — so cfg.mesh_path
    (solvers/problem.py:75) is format-agnostic."""
    from savtpu.mesh import write_msh
    from savtpu.mesh.vtk_io import write_vtk

    m = _small_mesh()
    write_vtu(tmp_path / "m.vtu", m)
    write_msh(tmp_path / "m.msh", m)
    write_vtk(tmp_path / "m.vtk", m)
    for ext in ("vtu", "msh", "vtk"):
        _assert_same(m, read_mesh(tmp_path / f"m.{ext}"))


def test_big_endian_rejected(tmp_path):
    doc = _vtu_ascii(_small_mesh()).decode().replace(
        'byte_order="LittleEndian"', 'byte_order="BigEndian"')
    p = tmp_path / "d.vtu"
    p.write_bytes(doc.encode())
    with pytest.raises(ValueError, match="LittleEndian"):
        read_vtu(p)
