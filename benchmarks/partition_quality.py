"""Partition-quality comparison: interface size and edge cut per method.

The interface (shared-node) count directly sets the LSTM input width and
the per-step exchange volume (psum length / permute buffer sizes), and the
edge cut tracks the halo work — the quantities ParMETIS minimizes for the
reference (Data_prepare.py:94). Measures graph / rcb / slab on the beam
AND on non-slab-like geometries (a thick block and a plate) where
coordinate bisection is no longer trivially optimal.

Writes benchmarks/partition_quality.json and prints a markdown table.
Host-only (no accelerator needed).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from savtpu.mesh import beam_mesh, dirichlet_nodes
from savtpu.parallel import build_partition_maps, partition_elements
from savtpu.parallel.partition import dual_graph


def measure(cells, points, n_parts, method):
    t0 = time.perf_counter()
    epart = partition_elements(cells, points, n_parts, method=method)
    part_s = time.perf_counter() - t0
    dn = np.zeros(0, dtype=np.int64)
    maps = build_partition_maps(cells, epart, len(points), dn)

    xadj, adjncy = dual_graph(cells)
    src = np.repeat(np.arange(len(cells)), np.diff(xadj))
    cut = int(np.sum(epart[src] != epart[adjncy]) // 2)

    counts = np.bincount(epart, minlength=n_parts)
    return {
        "method": method,
        "n_parts": n_parts,
        "edge_cut": cut,
        "global_shared_nodes": int(len(maps.global_shared)),
        "max_shared_per_part": int(maps.max_shared),
        "imbalance": float(counts.max() / (len(cells) / n_parts)),
        "partition_seconds": round(part_s, 4),
    }


GEOMETRIES = {
    # slab-like: the reference cantilever family
    "beam_48x4x4": ((48, 4, 4), (12.0, 1.0, 1.0)),
    # thick block: no long axis — slab/rcb must cut large faces
    "block_12x12x12": ((12, 12, 12), (1.0, 1.0, 1.0)),
    # flat plate: two comparable axes
    "plate_24x24x3": ((24, 24, 3), (8.0, 8.0, 1.0)),
}


def main():
    meshes = {
        name: beam_mesh(*cells_n, extent=extent)
        for name, (cells_n, extent) in GEOMETRIES.items()
    }
    # the reference's gmsh mesh is UNSTRUCTURED — the case where FM
    # refinement can strictly beat coordinate bisection (structured Kuhn
    # meshes have axis-aligned cuts that are already locally optimal)
    ref = Path("/root/reference/Mesh_info/beam_coarse.vtk")
    if ref.exists():
        from savtpu.mesh import read_vtk

        meshes["gmsh_beam_unstructured"] = read_vtk(ref)

    results = []
    for name, mesh in meshes.items():
        for n_parts in (4, 8, 16):
            if n_parts * 8 > len(mesh.tetra):
                continue
            for method in ("graph", "rcb", "slab"):
                r = measure(mesh.tetra, mesh.points, n_parts, method)
                r["geometry"] = name
                r["elements"] = len(mesh.tetra)
                results.append(r)
                print(json.dumps(r), flush=True)

    Path(__file__).parent.joinpath("partition_quality.json").write_text(
        json.dumps(results, indent=2)
    )

    print("\n| geometry | parts | method | edge cut | shared nodes "
          "| max shared/part | imbalance |")
    print("|---|---|---|---|---|---|---|")
    for r in results:
        print(
            f"| {r['geometry']} | {r['n_parts']} | {r['method']} "
            f"| {r['edge_cut']} | {r['global_shared_nodes']} "
            f"| {r['max_shared_per_part']} | {r['imbalance']:.2f} |"
        )


if __name__ == "__main__":
    main()
