from . import decode  # noqa: F401
