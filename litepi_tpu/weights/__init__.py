from litepi_tpu.weights.torch_import import (
    convert_classifier_state_dict,
    convert_detector_state_dict,
    load_torch_state_dict,
)
from litepi_tpu.weights.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "convert_classifier_state_dict",
    "convert_detector_state_dict",
    "load_torch_state_dict",
    "save_checkpoint",
    "load_checkpoint",
]
