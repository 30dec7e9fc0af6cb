"""Regenerate the shipped darknet-format model config.

The reference generates its cfg with a sed-based shell script
(``config/create_custom_model.sh``); here the canonical model definition is
the native Python builder (:func:`amyloid_yolo_tpu.graphspec.yolov3_spec`)
and the cfg is merely an interop serialization of it.

Usage: ``python -m amyloid_yolo_tpu.config.make_cfg [num_classes]``
"""

import os
import sys

from ..graphspec import emit_cfg, yolov3_spec


def main(num_classes: int = 2) -> str:
    path = os.path.join(os.path.dirname(__file__), "yolov3-amyloid.cfg")
    with open(path, "w") as fh:
        fh.write(emit_cfg(yolov3_spec(num_classes)))
    return path


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    print(main(n))
