from .vtk_io import read_vtk, write_vtk, Mesh
from .generator import beam_mesh
from .geometry import min_mesh_size, cfl_dt, dirichlet_nodes

__all__ = [
    "read_vtk",
    "write_vtk",
    "Mesh",
    "beam_mesh",
    "min_mesh_size",
    "cfl_dt",
    "dirichlet_nodes",
]
