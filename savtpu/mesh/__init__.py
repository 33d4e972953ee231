from .vtk_io import read_vtk, write_vtk, Mesh
from .vtu_io import read_vtu, write_vtu
from .msh_io import read_msh, write_msh, read_mesh
from .generator import beam_mesh, tube_mesh
from .geometry import min_mesh_size, cfl_dt, dirichlet_nodes

__all__ = [
    "read_vtk",
    "write_vtk",
    "read_vtu",
    "write_vtu",
    "read_msh",
    "write_msh",
    "read_mesh",
    "Mesh",
    "beam_mesh",
    "tube_mesh",
    "min_mesh_size",
    "cfl_dt",
    "dirichlet_nodes",
]
