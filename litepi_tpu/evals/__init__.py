from litepi_tpu.evals.labels import (
    parse_yolo_label,
    load_class_names,
    sample_images,
)
from litepi_tpu.evals.map import evaluate_predictions, match_predictions
from litepi_tpu.evals.reference import (
    compute_ap_reference,
    evaluate_predictions_reference,
    match_predictions_reference,
)

__all__ = [
    "parse_yolo_label",
    "load_class_names",
    "sample_images",
    "evaluate_predictions",
    "match_predictions",
    "compute_ap_reference",
    "evaluate_predictions_reference",
    "match_predictions_reference",
]
