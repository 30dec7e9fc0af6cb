from . import boxes, loss, merge, metrics, nms, preprocess, targets  # noqa: F401
