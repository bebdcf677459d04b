from litepi_tpu.ops.letterbox import (
    letterbox_host,
    letterbox_params,
    letterbox_device,
)
from litepi_tpu.ops.boxes import (
    xywh_to_xyxy,
    xyxy_to_xywh,
    box_iou,
    unletterbox_boxes,
    clip_boxes,
)
from litepi_tpu.ops.anchors import make_anchors
from litepi_tpu.ops.dfl import dfl_decode, decode_boxes
from litepi_tpu.ops.nms import nms_fixed, nms_numpy_reference
from litepi_tpu.ops.roi import crop_and_resize, crop_and_resize_windowed

__all__ = [
    "letterbox_host",
    "letterbox_params",
    "letterbox_device",
    "xywh_to_xyxy",
    "xyxy_to_xywh",
    "box_iou",
    "unletterbox_boxes",
    "clip_boxes",
    "make_anchors",
    "dfl_decode",
    "decode_boxes",
    "nms_fixed",
    "nms_numpy_reference",
    "crop_and_resize",
    "crop_and_resize_windowed",
]
