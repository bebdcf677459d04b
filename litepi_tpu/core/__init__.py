from litepi_tpu.core.types import (
    DetectorConfig,
    NMSConfig,
    PipelineConfig,
    YOLO_PLUS_V1,
    YOLO_PLUS_V2,
    YOLOV8N,
)
from litepi_tpu.core.metrics import PipelineMetrics, StageTimer

__all__ = [
    "DetectorConfig",
    "NMSConfig",
    "PipelineConfig",
    "YOLO_PLUS_V1",
    "YOLO_PLUS_V2",
    "YOLOV8N",
    "PipelineMetrics",
    "StageTimer",
]
