from . import injector  # noqa: F401
