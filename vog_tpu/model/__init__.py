from vog_tpu.model.grounding import (
    MODELS,
    ImgGrnd,
    VOGNet,
    VidGrnd,
    compute_loss,
    get_model,
)
from vog_tpu.model.loss import masked_bce_loss
from vog_tpu.model.lstm import TorchBiLSTM

__all__ = [
    "MODELS",
    "ImgGrnd",
    "VidGrnd",
    "VOGNet",
    "compute_loss",
    "get_model",
    "masked_bce_loss",
    "TorchBiLSTM",
]
