from .profiling import StepTimer, profile_trace
from .checkpoint import save_solver_state, load_solver_state

__all__ = [
    "StepTimer",
    "profile_trace",
    "save_solver_state",
    "load_solver_state",
]
