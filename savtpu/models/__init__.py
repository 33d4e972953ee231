from .lstm import (
    init_seq2seq,
    encoder_forward,
    decoder_step,
    seq2seq_predict,
)
from .data import (
    strided_windows,
    scale_to_zero_one,
    scale_forward,
    scale_back,
    train_val_split,
)
from .training import TrainState, fit, evaluate
from .predictor import phase_interleaved_predict

__all__ = [
    "init_seq2seq",
    "encoder_forward",
    "decoder_step",
    "seq2seq_predict",
    "strided_windows",
    "scale_to_zero_one",
    "scale_forward",
    "scale_back",
    "train_val_split",
    "TrainState",
    "fit",
    "evaluate",
    "phase_interleaved_predict",
]
