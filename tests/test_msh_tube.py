"""Gmsh .msh ingestion (mesh/msh_io.py) and the tube geometry
(mesh/generator.tube_mesh) — the reference's general-mesh capability
(meshio at Data_prepare.py:56-62, gmsh workflow README.md:44) on a
non-beam, coronary-like geometry.
"""

import numpy as np
import pytest

from savtpu.mesh import (
    beam_mesh,
    read_mesh,
    read_msh,
    tube_mesh,
    write_msh,
)


def test_msh22_roundtrip(tmp_path):
    mesh = beam_mesh(4, 2, 2, extent=(4.0, 1.0, 1.0))
    p = tmp_path / "beam.msh"
    write_msh(p, mesh)
    back = read_msh(p)
    assert np.allclose(back.points, mesh.points)
    assert np.array_equal(back.tetra, mesh.tetra)
    assert np.array_equal(back.triangles, mesh.triangles)
    # extension dispatcher
    assert np.array_equal(read_mesh(p).tetra, mesh.tetra)


def test_msh41_parse(tmp_path):
    """Hand-written MSH 4.1 with entity blocks, sparse node tags, and a
    skipped element type (line), matching what current gmsh emits."""
    text = """$MeshFormat
4.1 0 8
$EndMeshFormat
$Nodes
2 5 10 52
3 1 0 3
10
20
30
0 0 0
1 0 0
0 1 0
3 2 0 2
51
52
0 0 1
1 1 1
$EndNodes
$Elements
2 3 1 3
1 1 1 1
1 10 20
3 1 4 2
2 10 20 30 51
3 20 30 51 52
$EndElements
"""
    p = tmp_path / "v41.msh"
    p.write_text(text)
    mesh = read_msh(p)
    assert mesh.points.shape == (5, 3)
    # tags 10,20,30,51,52 -> dense 0..4 in sorted-tag order
    assert np.allclose(mesh.points[3], [0, 0, 1])
    assert np.array_equal(mesh.tetra, [[0, 1, 2, 3], [1, 2, 3, 4]])
    assert "line" not in mesh.cells


def test_msh22_binary_roundtrip(tmp_path):
    """gmsh emits binary with -bin; reference reads it via meshio
    (Data_prepare.py:57). Write binary 2.2, read back, compare exact."""
    mesh = tube_mesh(n_r=1, n_theta=8, n_z=3)
    p = tmp_path / "tube_bin22.msh"
    write_msh(p, mesh, binary=True)
    back = read_msh(p)
    assert np.array_equal(back.points, mesh.points)
    assert np.array_equal(back.tetra, mesh.tetra)
    assert np.array_equal(back.triangles, mesh.triangles)
    # the payload really is binary (int tags are raw, not ASCII digits)
    assert b"\x01\x00\x00\x00" in p.read_bytes()


def test_msh41_binary_roundtrip(tmp_path):
    mesh = beam_mesh(3, 2, 2, extent=(3.0, 1.0, 1.0))
    p = tmp_path / "beam_bin41.msh"
    write_msh(p, mesh, binary=True, version="4.1")
    back = read_msh(p)
    assert np.array_equal(back.points, mesh.points)
    assert np.array_equal(back.tetra, mesh.tetra)
    assert np.array_equal(back.triangles, mesh.triangles)
    assert np.array_equal(read_mesh(p).tetra, mesh.tetra)


def test_msh22_binary_big_endian(tmp_path):
    """Both endiannesses are legal; the embedded int-1 probe decides.
    Hand-build a one-tet big-endian 2.2 binary file."""
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                   dtype=">f8")
    buf = [b"$MeshFormat\n2.2 1 8\n",
           np.array(1, dtype=">i4").tobytes(), b"\n$EndMeshFormat\n",
           b"$Nodes\n4\n"]
    for i in range(4):
        buf.append(np.array(i + 1, dtype=">i4").tobytes())
        buf.append(pts[i].tobytes())
    buf += [b"\n$EndNodes\n$Elements\n1\n",
            np.array([4, 1, 2], dtype=">i4").tobytes(),
            np.array([1, 0, 0, 1, 2, 3, 4], dtype=">i4").tobytes(),
            b"\n$EndElements\n"]
    p = tmp_path / "be.msh"
    p.write_bytes(b"".join(buf))
    mesh = read_msh(p)
    assert np.array_equal(mesh.points, pts.astype("<f8"))
    assert np.array_equal(mesh.tetra, [[0, 1, 2, 3]])


def test_msh_binary_truncated(tmp_path):
    p = tmp_path / "bad.msh"
    mesh = beam_mesh(2, 1, 1, extent=(2.0, 1.0, 1.0))
    good = tmp_path / "good.msh"
    write_msh(good, mesh, binary=True)
    p.write_bytes(good.read_bytes()[:-40])
    with pytest.raises(ValueError):
        read_msh(p)


def test_read_mesh_unknown_extension(tmp_path):
    p = tmp_path / "mesh.xyz"
    p.write_text("")
    with pytest.raises(ValueError, match="unsupported mesh format"):
        read_mesh(p)


def test_tube_mesh_valid():
    mesh = tube_mesh(n_r=2, n_theta=12, n_z=8)
    tets = mesh.tetra
    assert len(tets) == 6 * 2 * 12 * 8
    # positive volumes (generator asserts, but pin it here too)
    P = mesh.points[tets]
    vol6 = np.einsum(
        "ei,ei->e",
        np.cross(P[:, 1] - P[:, 0], P[:, 2] - P[:, 0]),
        P[:, 3] - P[:, 0],
    )
    assert (vol6 > 0).all()
    # total volume == annulus area x length (tets tile the polygonal tube)
    n_theta = 12
    poly_ratio = np.sin(2 * np.pi / n_theta) / (2 * np.pi / n_theta)
    expect = np.pi * (1.0**2 - 0.5**2) * 5.0 * poly_ratio
    assert abs(vol6.sum() / 6.0 - expect) / expect < 1e-12
    # boundary triangles close the surface: every boundary edge shared by
    # exactly two boundary triangles (watertight)
    tris = mesh.triangles
    edges = np.sort(
        np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [0, 2]]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_tube_pipeline_end_to_end(tmp_path):
    """Full 5-stage sync-avoiding pipeline on the tube read from a .msh
    file — the non-beam general-mesh path (clamped z=0 end cap)."""
    from savtpu.io.artifacts import ArtifactStore, load_displacement
    from savtpu.pipeline import run_all
    from test_pipeline import _smoke_cfg

    mesh = tube_mesh(n_r=1, n_theta=8, n_z=6, length=3.0)
    mpath = tmp_path / "tube.msh"
    write_msh(mpath, mesh)

    cfg = _smoke_cfg(tmp_path)
    cfg.mesh_path = str(mpath)
    cfg.partition.dirichlet_axis = 2  # clamp the z=0 end cap
    run_all.run(cfg, verbose=False)
    store = ArtifactStore(cfg.workdir, cfg.model_dir, cfg.surrogate.run_tag())
    n_sync = cfg.surrogate.i_cri + 1
    for r in range(2):
        data = load_displacement(store.dynamics_h5(r))
        pred = load_displacement(store.modeled_h5(r))
        assert np.isfinite(pred).all()
        assert np.allclose(pred[:, :n_sync], data[:, :n_sync], atol=1e-10)
