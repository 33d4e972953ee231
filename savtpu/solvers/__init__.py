from .problem import AssembledProblem, setup_problem
from .steady import steady_solve, steady_displacement, ghost_step_init, eigen_modes
from .explicit import make_step_fn, run_explicit

__all__ = [
    "AssembledProblem",
    "setup_problem",
    "steady_solve",
    "steady_displacement",
    "ghost_step_init",
    "eigen_modes",
    "make_step_fn",
    "run_explicit",
]
