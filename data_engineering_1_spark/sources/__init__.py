from . import pdf  # noqa: F401
