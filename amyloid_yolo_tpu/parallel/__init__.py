from . import mesh, steps  # noqa: F401
