from litepi_tpu.models.yolo import YoloLitePi
from litepi_tpu.models.registry import build_classifier, CLASSIFIER_REGISTRY

__all__ = ["YoloLitePi", "build_classifier", "CLASSIFIER_REGISTRY"]
