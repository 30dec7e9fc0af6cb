from . import datasets, weights  # noqa: F401
