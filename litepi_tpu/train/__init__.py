from litepi_tpu.train.detector import (
    DetectorTrainState,
    create_detector_train_state,
    detector_train_step,
)
from litepi_tpu.train.classifier import (
    ClassifierTrainState,
    create_classifier_train_state,
    classifier_train_step,
)

__all__ = [
    "DetectorTrainState",
    "create_detector_train_state",
    "detector_train_step",
    "ClassifierTrainState",
    "create_classifier_train_state",
    "classifier_train_step",
]
