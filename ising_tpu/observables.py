"""Observables: spin counts, magnetization, energy, 2-point correlation.

TPU-native replacements for the reference's reduction kernels: the popcount
magnetization kernel (optimized/main.cu:702-734) becomes an XLA sum (bit
planes sum directly; the packed backend popcounts before calling in), CUB
DeviceReduce (basic_cuda/main.cu:289-311) is XLA's reduction, and the 2-point
correlation kernels (optimized/main.cu:870-1070) become a vmap of
roll-multiply-reduces over the offsets.

Accumulation strategy: devices produce exact per-row integer partial sums
(every per-row value provably fits int32/uint32 even at 2^20-column
lattices); the final accumulation happens host-side in int64. This avoids
needing jax x64 mode and is exact at any lattice size — the same trick as
the reference's chunked CUB reduction (basic_cuda/main.cu:291-302). On
sharded arrays XLA gathers the row vectors automatically (replacing MPI
allreduce, basic_python/ising_basic.py:242-243).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .constants import MAX_CORR_LEN
from .lattice import bits_to_spins, compact_to_full


# ----------------------------------------------------------------------------
# Device-side exact partial reductions (jit-friendly).

def row_up_counts(black, white):
    """Per-row count of up spins, uint32 (row width <= 2^20 always fits)."""
    return (jnp.sum(black.astype(jnp.uint32), axis=1)
            + jnp.sum(white.astype(jnp.uint32), axis=1))


def energy_row_sums(black, white, v=None, h=None):
    """Per-row exact bond-energy sums, int32: sum_x (J_r s s_right + J_d s s_down).

    v/h are optional full-lattice antiferro link flags (J = 1 - 2*flag).
    Counts each bond once (right + down neighbor of every site).
    """
    s = bits_to_spins(compact_to_full(black, white)).astype(jnp.int32)
    right = jnp.roll(s, -1, axis=1)
    down = jnp.roll(s, -1, axis=0)
    hb = s * right
    vb = s * down
    if h is not None:
        hb = hb * (1 - 2 * h.astype(jnp.int32))
    if v is not None:
        vb = vb * (1 - 2 * v.astype(jnp.int32))
    return jnp.sum(hb + vb, axis=1)


def correlation_row_sums(black, white, corr_len: int = MAX_CORR_LEN,
                         xsl: int | None = None, ysl: int | None = None):
    """Exact per-(offset, row) correlation sums, int32 of shape (corr_len, Y).

    Entry [d-1, y] = sum_x [s(y,x)s(y,x+d) + s(y,x)s(y+d,x)], shifts periodic
    in the full lattice, or wrapping inside xsl x ysl replica tiles when
    given (reference getCorr2DRepl_k, optimized/main.cu:967-1070).
    """
    s = bits_to_spins(compact_to_full(black, white)).astype(jnp.int32)
    Y, X = s.shape
    if xsl is not None:
        t = s.reshape(Y // ysl, ysl, X // xsl, xsl)

        def one(d):
            # Keep one exact partial per lattice row (always fits int32).
            hcorr = jnp.sum(t * jnp.roll(t, -d, axis=3), axis=(2, 3))
            vcorr = jnp.sum(t * jnp.roll(t, -d, axis=1), axis=(2, 3))
            return (hcorr + vcorr).reshape(Y)  # (Y,)
    else:
        def one(d):
            hcorr = jnp.sum(s * jnp.roll(s, -d, axis=1), axis=1)
            vcorr = jnp.sum(s * jnp.roll(s, -d, axis=0), axis=1)
            return hcorr + vcorr  # (Y,)

    # Sequential map, not vmap: batching the rolls would materialize a
    # (corr_len, Y, X) intermediate — gigabytes at production lattice sizes.
    return jax.lax.map(one, jnp.arange(1, corr_len + 1))


# ----------------------------------------------------------------------------
# Host-side exact finishes.

def count_spins(black, white):
    """(n_up, n_down) as exact Python ints (reference countSpins)."""
    ups = np.asarray(jax.device_get(row_up_counts(black, white)),
                     dtype=np.int64).sum()
    total = black.size + white.size
    return int(ups), int(total - ups)


def magnetization(black, white) -> float:
    """|m| in [0, 1]: |n_up - n_down| / N, as printed by the reference."""
    n_up, n_dn = count_spins(black, white)
    return abs(n_up - n_dn) / (black.size + white.size)


def energy_per_spin(black, white, v=None, h=None) -> float:
    """Internal energy per spin, E/N = -(1/N) sum_<ij> J_ij s_i s_j."""
    rows = np.asarray(jax.device_get(energy_row_sums(black, white, v, h)),
                      dtype=np.int64).sum()
    return -float(rows) / (black.size + white.size)


def correlation(black, white, corr_len: int = MAX_CORR_LEN,
                xsl: int | None = None, ysl: int | None = None) -> np.ndarray:
    """c(d) for d=1..corr_len, normalized by 2N (optimized/main.cu:1129-1135)."""
    rows = np.asarray(jax.device_get(
        correlation_row_sums(black, white, corr_len, xsl, ysl)), dtype=np.int64)
    n = black.size + white.size
    return rows.sum(axis=1) / (2.0 * n)


def packed_row_up_counts(black_w, white_w):
    """row_up_counts computed directly on packed uint32 storage.

    The popcount path of the reference's getMagn_k (optimized/main.cu:702-734
    via __popc): mask each word to its fields' low bits and popcount, without
    unpacking 8x to bit planes.
    """
    def rows(w):
        m = (w & jnp.uint32(0x11111111))
        return jnp.sum(jax.lax.population_count(m).astype(jnp.uint32), axis=1)
    return rows(black_w) + rows(white_w)


def replica_magnetizations(black, white, xsl: int, ysl: int) -> np.ndarray:
    """|m| per sub-lattice replica, shape (Y//ysl, X//xsl) -> flattened.

    New capability beyond the reference (which only prints the global
    magnetization even in replica mode): per-replica statistics feed the
    Binder-cumulant / susceptibility analysis in analysis.py.
    """
    from .lattice import bits_to_spins, compact_to_full
    if xsl * ysl >= 2 ** 31:
        raise ValueError("replica size too large for exact int32 sums")
    s = bits_to_spins(compact_to_full(black, white)).astype(jnp.int32)
    Y, X = s.shape
    t = s.reshape(Y // ysl, ysl, X // xsl, xsl)
    sums = jnp.sum(t, axis=(1, 3))  # per-replica spin sum, exact int32
    m = np.abs(np.asarray(jax.device_get(sums), np.float64)) / (xsl * ysl)
    return m.reshape(-1)
