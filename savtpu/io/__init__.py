from .artifacts import (
    ArtifactStore,
    save_displacement,
    load_displacement,
    save_params,
    load_params,
)

__all__ = [
    "ArtifactStore",
    "save_displacement",
    "load_displacement",
    "save_params",
    "load_params",
]
