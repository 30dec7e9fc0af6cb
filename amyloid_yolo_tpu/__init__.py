"""amyloid_yolo_tpu — a TPU-native JAX framework for amyloid-plaque detection.

A from-scratch rebuild of the capabilities of keiserlab/amyloid-yolo-paper
(YOLOv3 plaque detector + WSI pipeline + prospective-validation study layer),
designed TPU-first: static compiled graphs, NHWC/bf16 compute on the MXU,
fixed-shape masked detection ops under ``jit``, data-parallel training over a
``jax.sharding.Mesh``, and a native (C++) host tile-streaming runtime.
"""

from .graphspec import GraphSpec, from_cfg, yolov3_spec, emit_cfg
from .parsecfg import parse_model_config, parse_data_config, load_classes

__version__ = "0.1.0"
