from .profiling import MetricsLog, StepTimer, profile_trace, stage_log
from .checkpoint import save_solver_state, load_solver_state

__all__ = [
    "MetricsLog",
    "StepTimer",
    "profile_trace",
    "stage_log",
    "save_solver_state",
    "load_solver_state",
]
