from .quadrature import tet_quadrature
from .shape import shape_function, shape_derivative
from .material import LinearElastic
from .element import element_mkf, element_k
from .assembly import (
    element_dofs,
    assemble_dense,
    assemble_lumped_mass,
    lumping,
    lumping_to_vec,
    assemble_force,
    FIntOperator,
)

__all__ = [
    "tet_quadrature",
    "shape_function",
    "shape_derivative",
    "LinearElastic",
    "element_mkf",
    "element_k",
    "element_dofs",
    "assemble_dense",
    "assemble_lumped_mass",
    "lumping",
    "lumping_to_vec",
    "assemble_force",
    "FIntOperator",
]
