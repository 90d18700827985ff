from . import vectors  # noqa: F401
