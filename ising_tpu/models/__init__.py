from . import ising  # noqa: F401
