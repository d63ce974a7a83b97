"""ising-tpu: a TPU-native 2D Ising Monte Carlo framework in JAX.

Built from scratch with the capabilities of NVIDIA/ising-gpu (see SURVEY.md):
one library with swappable checkerboard-Metropolis update backends
("xla", Pallas "dense", Pallas "packed", "mxu", and the 1-bit/spin "bit1"
speed tier), counter-based RNG families shared by all of them (bit-exact
trajectories across backends, device counts, and checkpoint/resume),
shard_map slab decomposition with ppermute halo exchange for multi-chip
runs, and the full reference feature set plus beyond-reference
capabilities: checkpoint/resume, parallel tempering (tempering.py),
Swendsen-Wang cluster updates (cluster.py), a uniform external field,
and the MC statistics toolkit (analysis.py, reweight.py).
"""

from .config import SimConfig  # noqa: F401
from .constants import TCRIT, BLACK, WHITE  # noqa: F401
from .ops import get_backend, available_backends  # noqa: F401

__version__ = "0.4.0"
