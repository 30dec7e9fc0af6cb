from . import darknet, heads  # noqa: F401
