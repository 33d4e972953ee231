from . import (
    data_prepare,
    shared_extraction,
    model_training,
    online_predictor,
    plotter,
)
from .common import StageContext, build_context

__all__ = [
    "data_prepare",
    "shared_extraction",
    "model_training",
    "online_predictor",
    "plotter",
    "StageContext",
    "build_context",
]
