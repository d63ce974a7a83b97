from . import codec  # noqa: F401
