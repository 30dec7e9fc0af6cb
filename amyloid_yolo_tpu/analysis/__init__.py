from . import plots, prospective, validation  # noqa: F401
