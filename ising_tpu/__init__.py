"""ising-tpu: a TPU-native 2D Ising Monte Carlo framework in JAX.

Built from scratch with the capabilities of NVIDIA/ising-gpu (see SURVEY.md):
one library with swappable checkerboard-Metropolis update backends
("xla", Pallas "dense", Pallas "packed", "mxu"), a counter-based Philox RNG
shared by all of them, shard_map slab decomposition with ppermute halo
exchange for multi-chip runs, and the full reference feature set plus
first-class checkpoint/resume.
"""

from .config import SimConfig  # noqa: F401
from .constants import TCRIT, BLACK, WHITE  # noqa: F401
from .ops import get_backend, available_backends  # noqa: F401

__version__ = "0.3.0"
