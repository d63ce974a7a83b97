from .registry import get_backend, available_backends  # noqa: F401
