"""litepi_tpu — TPU-native two-stage traffic-sign recognition framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
YOLO-LitePi project (a Raspberry-Pi CPU pipeline built on NCNN / ONNX Runtime /
OpenVINO):

* a channel-pruned anchor-free YOLOv8-derived detector ("yolo_plus" /
  YOLO-LitePi) with DFL box decode,
* fixed-shape, fully on-device postprocessing (decode -> confidence filter ->
  NMS) so nothing round-trips to the host,
* in-graph ROI crop + resize feeding a batched ShuffleNetV2 (or ResNet18 /
  MobileNetV2 / EfficientNet-B0) classifier,
* an evaluation harness (precision / recall / F1, mAP@0.5, mAP@0.5:0.95, FPS,
  per-stage latency) and an `e2e.py`-compatible CLI.

The reference's three CPU inference engines collapse into a single XLA backend;
its per-image Python orchestration becomes one jitted, batched program.

Subpackages
-----------
core      dtypes, configs, static-shape contracts, metrics
ops       letterbox, box math, anchors, DFL decode, NMS, ROI crop (Pallas where hot)
models    Flax detector + classifier model zoo
weights   torch-state-dict -> JAX pytree converters, orbax checkpoints
pipeline  the fused two-stage program and its host-side driver
parallel  device-mesh / sharding utilities (data-parallel serving + training)
train     training steps (classifier CE; detector TAL/CIoU/DFL)
evals     YOLO-format labels, Ultralytics-style mAP
apps      CLIs mirroring the reference flag surface
bench     warmup/measure harness, CSV schemas
"""

__version__ = "0.1.0"
