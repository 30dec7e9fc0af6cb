from . import prospective, validation  # noqa: F401
