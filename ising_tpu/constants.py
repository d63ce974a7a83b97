"""Physical and numerical constants shared by every backend.

The reference defines these identically in each of its four tiers
(e.g. /root/reference/optimized/main.cu:42-44, basic_cuda/main.cu:38,
basic_python/ising_basic.py:33, tensorcore/main.cu:39); here they live once.
"""

# Critical temperature of the 2D Ising model, 2/ln(1+sqrt(2)).
TCRIT = 2.26918531421

# Default temperature coefficient (reference ALPHA_DEF, optimized/main.cu:43).
ALPHA_DEF = 0.1

# Floor used by the temperature-ramp feature (reference MIN_TEMP,
# optimized/main.cu:44).
MIN_TEMP = 0.05 * TCRIT

# Default seed used by the reference flagship (optimized/main.cu:63).
SEED_DEF = 463463564571

# Early-exit tolerance on |magnetization - target| (optimized/main.cu:65).
TGT_MAGN_MAX_DIFF = 1.0e-3

# Maximum measured 2-point correlation distance (optimized/main.cu:70).
MAX_CORR_LEN = 128

# Spins per packed 32-bit word in the packed backend (4 bits per spin, the
# TPU analog of the reference's 16-per-64-bit-word, optimized/main.cu:40).
BITS_PER_SPIN = 4
SPINS_PER_WORD = 32 // BITS_PER_SPIN  # 8

# Checkerboard colors.
BLACK = 0
WHITE = 1
