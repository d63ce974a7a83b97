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

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .constants import MAX_CORR_LEN
from .lattice import bits_to_spins, compact_to_full


# ----------------------------------------------------------------------------
# Device-side exact partial reductions (jit-friendly).
#
# Scale note: everything here works on the compact (Y, X/2) uint8 planes in
# the XOR domain (s1*s2 = 1 - 2*(b1^b2)), never materializing the full (Y, X)
# int32 spin lattice — the reference's packed in-place reductions
# (optimized/main.cu:702-734, 870-1070) have the same property. At the
# reference's 65536^2-per-chip scale the old full-int32 formulation would
# need ~17 GB; the compact uint8 formulation's largest intermediate is the
# (Y, X/2) uint8 XOR plane, which XLA fuses into the row reduction.

def row_up_counts(black, white):
    """Per-row count of up spins, uint32 (row width <= 2^20 always fits)."""
    return (jnp.sum(black.astype(jnp.uint32), axis=1)
            + jnp.sum(white.astype(jnp.uint32), axis=1))


def _col_parity_planes(black, white):
    """Compact color planes -> column-parity planes (E, O), uint8.

    E[y, j] = bit at full-lattice site (y, 2j), O[y, j] = bit at (y, 2j+1)
    (lattice.py storage convention: which color that is depends on the row
    parity). Neighbor relations are parity-uniform in this basis, which is
    what lets every reduction below stay in the compact domain.
    """
    nrows = black.shape[0]
    row_odd = (jnp.arange(nrows) % 2).astype(bool)[:, None]
    e = jnp.where(row_odd, white, black)
    o = jnp.where(row_odd, black, white)
    return e, o


@jax.jit
def energy_row_sums(black, white, v=None, h=None):
    """Per-row exact bond-energy sums, int32: sum_x (J_r s s_right + J_d s s_down).

    v/h are optional full-lattice antiferro link flags (J = 1 - 2*flag).
    Counts each bond once (right + down neighbor of every site). Computed
    as XOR counts on the compact planes: each row has ncols horizontal +
    ncols vertical bonds, and sum(s_i s_j) = #bonds - 2 * #antialigned.
    """
    e, o = _col_parity_planes(black, white)
    ncols = 2 * e.shape[1]
    # Horizontal bonds (y,2j)-(y,2j+1) and (y,2j+1)-(y,2j+2 mod X).
    hx1 = e ^ o
    hx2 = o ^ jnp.roll(e, -1, axis=1)
    # Vertical bonds (y,x)-(y+1 mod Y, x), split by column parity.
    vx1 = e ^ jnp.roll(e, -1, axis=0)
    vx2 = o ^ jnp.roll(o, -1, axis=0)
    if h is not None:
        hx1 = hx1 ^ h[:, 0::2]
        hx2 = hx2 ^ h[:, 1::2]
    if v is not None:
        vx1 = vx1 ^ v[:, 0::2]
        vx2 = vx2 ^ v[:, 1::2]
    anti = jnp.sum((hx1 + hx2 + vx1 + vx2).astype(jnp.uint32), axis=1)
    return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)


def _tile_roll(x, shift: int, tile: int, axis: int):
    """Roll by `shift` *within* consecutive `tile`-sized groups along axis
    (periodic wrap inside each sub-lattice replica), as a reshape + roll."""
    if tile == x.shape[axis]:
        return jnp.roll(x, -shift, axis=axis)
    shp = x.shape
    new = shp[:axis] + (shp[axis] // tile, tile) + shp[axis + 1:]
    return jnp.roll(x.reshape(new), -shift, axis=axis + 1).reshape(shp)


@functools.partial(jax.jit, static_argnames=("corr_len", "xsl", "ysl"))
def correlation_row_sums(black, white, corr_len: int = MAX_CORR_LEN,
                         xsl: int | None = None, ysl: int | None = None):
    """Exact per-(offset, row) correlation sums, int32 of shape (corr_len, Y).

    Entry [d-1, y] = sum_x [s(y,x)s(y,x+d) + s(y,x)s(y+d,x)], shifts periodic
    in the full lattice, or wrapping inside xsl x ysl replica tiles when
    given (reference getCorr2DRepl_k, optimized/main.cu:967-1070).
    """
    e, o = _col_parity_planes(black, white)
    Y, ch = e.shape
    ncols = 2 * ch
    csl = (xsl // 2) if xsl is not None else ch
    ytile = ysl if ysl is not None else Y

    def one(d):
        # Horizontal offset d: even d pairs same column parity, odd d
        # crosses parity with a half-offset split (see lattice.py).
        dh = d // 2
        deven = (d % 2) == 0
        if_even = lambda a, b: a if deven else b
        hx1 = e ^ _tile_roll(if_even(e, o), if_even(dh, dh), csl, 1)
        hx2 = o ^ _tile_roll(if_even(o, e), if_even(dh, dh + 1), csl, 1)
        # Vertical offset d: always same column parity.
        vx1 = e ^ _tile_roll(e, d, ytile, 0)
        vx2 = o ^ _tile_roll(o, d, ytile, 0)
        anti = jnp.sum((hx1 + hx2 + vx1 + vx2).astype(jnp.uint32), axis=1)
        return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)  # (Y,)

    # Sequential map over offsets, not vmap: batching would materialize a
    # (corr_len, Y, X/2) intermediate — gigabytes at production sizes. The
    # offsets are static Python ints so the roll amounts stay constant.
    return jnp.stack([one(d) for d in range(1, corr_len + 1)])


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
    Binder-cumulant / susceptibility analysis in analysis.py. Computed on
    the compact planes (each xsl-wide replica holds xsl/2 columns of each
    color plane); per-replica up-counts are exact uint32.
    """
    if xsl * ysl >= 2 ** 31:
        raise ValueError("replica size too large for exact int32 sums")
    Y, ch = black.shape
    csl = xsl // 2

    @jax.jit
    def tile_up_counts(b, w):
        def one(p):
            t = p.reshape(Y // ysl, ysl, ch // csl, csl)
            return jnp.sum(t.astype(jnp.uint32), axis=(1, 3))
        return one(b) + one(w)

    n = xsl * ysl
    ups = np.asarray(jax.device_get(tile_up_counts(black, white)), np.int64)
    return (np.abs(2 * ups - n) / float(n)).reshape(-1)
