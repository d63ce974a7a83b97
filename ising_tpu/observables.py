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
def _energy_block(e_ext, o_ext, vh=None, hh=None):
    """Per-row bond-energy sums for one row slab (one wrap row appended)."""
    R = e_ext.shape[0] - 1
    e0, o0 = e_ext[:R], o_ext[:R]
    ncols = 2 * e0.shape[1]
    # Horizontal bonds (y,2j)-(y,2j+1) and (y,2j+1)-(y,2j+2 mod X).
    hx1 = e0 ^ o0
    hx2 = o0 ^ jnp.roll(e0, -1, axis=1)
    # Vertical bonds (y,x)-(y+1 mod Y, x), split by column parity; the
    # row-below view is a SLICE of the extended slab, not a plane roll.
    vx1 = e0 ^ e_ext[1:R + 1]
    vx2 = o0 ^ o_ext[1:R + 1]
    if hh is not None:
        hx1 = hx1 ^ hh[:, 0::2]
        hx2 = hx2 ^ hh[:, 1::2]
    if vh is not None:
        vx1 = vx1 ^ vh[:, 0::2]
        vx2 = vx2 ^ vh[:, 1::2]
    anti = jnp.sum((hx1 + hx2 + vx1 + vx2).astype(jnp.uint32), axis=1)
    return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)


@jax.jit
def _energy_slab(black_ext, white_ext, vh=None, hh=None):
    """Parity extraction + bond sums as ONE compiled program per slab.

    The eager composition is ~18 separate dispatches; on a remote-TPU
    tunnel each dispatch pays a round trip, which made parallel
    tempering's per-rung energy the wall (measured ~15 s/round at K=32 —
    one jitted call per rung brings it to ~1 s). Same slab granularity,
    same memory bounds; XLA additionally fuses the XORs into the row
    reduction."""
    e_ext, o_ext = _col_parity_planes(black_ext, white_ext)
    return _energy_block(e_ext, o_ext, vh, hh)


def energy_row_sums(black, white, v=None, h=None, row_chunk: int = 8192):
    """Per-row exact bond-energy sums, int32: sum_x (J_r s s_right + J_d s s_down).

    v/h are optional full-lattice antiferro link flags (J = 1 - 2*flag).
    Counts each bond once (right + down neighbor of every site). Computed
    as XOR counts on the compact planes: each row has ncols horizontal +
    ncols vertical bonds, and sum(s_i s_j) = #bonds - 2 * #antialigned.
    Row-chunked like correlation_row_sums, so peak device memory stays
    O(row_chunk * ncols) at any lattice height (the column-parity planes
    are extracted per slab, never whole).
    """
    return energy_rows_via(
        lambda r, n: (_rows_wrap(black, r, n), _rows_wrap(white, r, n)),
        black.shape[0],
        None if v is None and h is None else
        (lambda r, n: (None if v is None else v[r:r + n],
                       None if h is None else h[r:r + n])),
        row_chunk=row_chunk)


def _rows_wrap(x, r: int, n: int):
    """Rows [r, r+n) with periodic wrap, as slices (no gather: TPU gathers
    of multi-GB operands allocate far more than the slice result). Handles
    n > Y (tiny lattices with corr_len > Y) by repeating whole periods."""
    Y = x.shape[0]
    if r + n <= Y:
        return x[r:r + n]
    pieces = [x[r:Y]]
    n -= Y - r
    while n > Y:
        pieces.append(x)
        n -= Y
    pieces.append(x[:n])
    return jnp.concatenate(pieces, axis=0)


def _fence(x):
    """Serialize slab dispatch outside tracing: async dispatch would queue
    every slab's multi-GB transients concurrently and OOM at 131072x65536+
    (verified on hardware); blocking per slab bounds live memory to one
    slab. No-op on tracers so the functions stay jit/make_jaxpr-safe."""
    if not isinstance(x, jax.core.Tracer):
        jax.block_until_ready(x)


def _tile_roll(x, shift: int, tile: int, axis: int):
    """Roll by `shift` *within* consecutive `tile`-sized groups along axis
    (periodic wrap inside each sub-lattice replica), as a reshape + roll."""
    if tile == x.shape[axis]:
        return jnp.roll(x, -shift, axis=axis)
    shp = x.shape
    new = shp[:axis] + (shp[axis] // tile, tile) + shp[axis + 1:]
    return jnp.roll(x.reshape(new), -shift, axis=axis + 1).reshape(shp)


@functools.partial(jax.jit, static_argnames=("corr_len", "csl", "ytile"))
def _corr_block(e_ext, o_ext, corr_len: int, csl: int, ytile: int | None):
    """Per-offset row sums for one row slab.

    e_ext/o_ext carry `corr_len` extra wrap rows at the bottom when ytile
    is None (full-lattice vertical shift via SLICES — no whole-plane rolls,
    which is what keeps peak memory at O(slab) and lets XLA fuse each
    offset's XOR+add into its row reduction). In replica mode (ytile set)
    the slab is ysl-aligned and self-contained, so vertical wrap is an
    in-slab tile roll and no extra rows are passed.
    """
    R = e_ext.shape[0] - (0 if ytile is not None else corr_len)
    ch = e_ext.shape[1]
    ncols = 2 * ch
    e0, o0 = e_ext[:R], o_ext[:R]

    def one(d):
        # Horizontal offset d: even d pairs same column parity, odd d
        # crosses parity with a half-offset split (see lattice.py).
        dh = d // 2
        deven = (d % 2) == 0
        if_even = lambda a, b: a if deven else b
        hx1 = e0 ^ _tile_roll(if_even(e0, o0), if_even(dh, dh), csl, 1)
        hx2 = o0 ^ _tile_roll(if_even(o0, e0), if_even(dh, dh + 1), csl, 1)
        # Vertical offset d: always same column parity.
        if ytile is not None:
            vx1 = e0 ^ _tile_roll(e0, d, ytile, 0)
            vx2 = o0 ^ _tile_roll(o0, d, ytile, 0)
        else:
            vx1 = e0 ^ e_ext[d:R + d]
            vx2 = o0 ^ o_ext[d:R + d]
        anti = jnp.sum((hx1 + hx2 + vx1 + vx2).astype(jnp.uint32), axis=1)
        return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)  # (R,)

    # Sequential map over offsets, not vmap: batching would materialize a
    # (corr_len, R, X/2) intermediate — gigabytes at production sizes. The
    # offsets are static Python ints so the shift amounts stay constant.
    return jnp.stack([one(d) for d in range(1, corr_len + 1)])


def correlation_row_sums(black, white, corr_len: int = MAX_CORR_LEN,
                         xsl: int | None = None, ysl: int | None = None,
                         row_chunk: int = 8192):
    """Exact per-(offset, row) correlation sums, int32 of shape (corr_len, Y).

    Entry [d-1, y] = sum_x [s(y,x)s(y,x+d) + s(y,x)s(y+d,x)], shifts periodic
    in the full lattice, or wrapping inside xsl x ysl replica tiles when
    given (reference getCorr2DRepl_k, optimized/main.cu:967-1070).

    Computed in row slabs of ~row_chunk rows: at the reference's 65536^2+
    sizes a whole-plane formulation OOMs (128 offsets x several
    1-byte/site roll intermediates scheduled concurrently), while slab
    slices keep the peak at O(row_chunk * ncols) and one compiled block
    program is reused across slabs.
    """
    Y, ch = black.shape
    if xsl is None and ysl is None:
        return correlation_rows_via(
            lambda r, n: (_rows_wrap(black, r, n), _rows_wrap(white, r, n)),
            Y, corr_len, row_chunk=row_chunk)

    # Replica mode: slabs must be ysl-aligned (self-contained vertical
    # wrap) and even-height so per-slab parity extraction stays
    # global-correct; the horizontal wrap stays inside csl-column tiles.
    csl = (xsl // 2) if xsl is not None else ch
    ytile = ysl if ysl is not None else Y
    R = (row_chunk // ytile) * ytile if ytile <= row_chunk else Y
    R = R or Y
    while Y % R:
        R -= ytile
    if R % 2:
        R = Y  # odd replica tile: fall back to one slab
    parts = []
    for r in range(0, Y, R):
        e_ext, o_ext = _col_parity_planes(black[r:r + R], white[r:r + R])
        parts.append(_corr_block(e_ext, o_ext, corr_len, csl, ytile))
        if R < Y:
            _fence(parts[-1])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


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


# ----------------------------------------------------------------------------
# Storage-streaming observables: identical slab math, but rows are decoded
# on demand from backend storage (decode_rows(r, n) -> compact (black,
# white) planes for wrapped rows [r, r+n)) — no full-lattice decode ever
# materializes. With disorder links resident on device, a packed 65536^2
# lattice cannot afford decoded planes AND links at once; these stream both.

def energy_rows_via(decode_rows, nrows: int, links_rows=None,
                    row_chunk: int = 8192):
    """energy_row_sums from storage via row callbacks.

    links_rows(r, n) -> (v, h) uint8 link rows [r, r+n), or None — a
    callback so disorder links can live bit-packed on device and unpack
    per slab.
    """
    Y = nrows
    R = min(Y, row_chunk)
    while Y % R:
        R -= 2
    parts = []
    for r in range(0, Y, R):
        b_ext, w_ext = decode_rows(r, R + 1)
        vs, hs = (None, None) if links_rows is None else links_rows(r, R)
        parts.append(_energy_slab(b_ext, w_ext, vs, hs))
        if R < Y:
            _fence(parts[-1])
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def correlation_rows_via(decode_rows, nrows: int,
                         corr_len: int = MAX_CORR_LEN,
                         row_chunk: int = 8192):
    """correlation_row_sums from storage via a row decoder callback
    (full-lattice wrap; replica mode keeps the array-input path)."""
    Y = nrows
    R = min(Y, row_chunk)
    while Y % R:
        R -= 2
    parts = []
    for r in range(0, Y, R):
        e_ext, o_ext = _col_parity_planes(*decode_rows(r, R + corr_len))
        parts.append(_corr_block(e_ext, o_ext, corr_len,
                                 e_ext.shape[1], None))
        if R < Y:
            _fence(parts[-1])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


# ----------------------------------------------------------------------------
# Word-domain observables for the bit1 tier (1 bit/spin, bit g of word j =
# compact column g*W1 + j). Bond products stay XORs on words; row sums are
# popcounts — no decode to byte planes, so the full measurement pipeline
# (magnetization + energy + 128-offset correlation) runs at shapes whose
# DECODED planes would not even fit (e.g. 524288 x 65536 on one chip).
# The reference's analog is its in-place packed reductions
# (optimized/main.cu:702-734, 870-1070).

def _rotr32(x, k: int):
    k %= 32
    if k == 0:
        return x
    return (x >> k) | (x << (32 - k))


def _col_shift_words(x, d: int):
    """Word plane of the (compact column + d) neighbor, periodic.

    Column of bit g, lane j is g*W1 + j, so col+d = bit (g + d//W1 [+1 on
    lane carry]) mod 32, lane (j + d) % W1 — i.e. a bit rotation, a lane
    roll, and one boundary select; rotating past bit 31 wraps by exactly
    32*W1 = C columns, which is the periodic wrap.
    """
    W1 = x.shape[1]
    db, dl = divmod(d, W1)
    lo = _rotr32(x, db)
    if dl == 0:
        return lo
    hi = _rotr32(x, db + 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < W1 - dl, jnp.roll(lo, -dl, axis=1),
                     jnp.roll(hi, -dl, axis=1))


def _popcount_rows(x):
    return jnp.sum(jax.lax.population_count(x).astype(jnp.uint32), axis=1)


@jax.jit
def _bit1_energy_block(e_ext, o_ext):
    """Word-domain analog of _energy_block (ordered case)."""
    R = e_ext.shape[0] - 1
    e0, o0 = e_ext[:R], o_ext[:R]
    ncols = 2 * 32 * e0.shape[1]
    anti = (_popcount_rows(e0 ^ o0)
            + _popcount_rows(o0 ^ _col_shift_words(e0, 1))
            + _popcount_rows(e0 ^ e_ext[1:R + 1])
            + _popcount_rows(o0 ^ o_ext[1:R + 1]))
    return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)


@jax.jit
def _bit1_energy_block_dis(e_ext, o_ext, vE, vO, hE, hO):
    """Quenched-disorder word-domain energy block.

    vE/vO/hE/hO are the antiferro link flags PARITY-SPLIT by full-lattice
    column (vE[y,j] = v-link flag at site (y, 2j), etc.) and packed in the
    bit1 word layout — the even/odd-split encoding that makes each bond
    class one whole-word XOR before the popcount, mirroring the byte-domain
    _energy_block's hh[:, 0::2] projections (the reference measures its
    disordered energies in-place packed the same way,
    optimized/main.cu:870-1070)."""
    R = e_ext.shape[0] - 1
    e0, o0 = e_ext[:R], o_ext[:R]
    ncols = 2 * 32 * e0.shape[1]
    anti = (_popcount_rows(e0 ^ o0 ^ hE)
            + _popcount_rows(o0 ^ _col_shift_words(e0, 1) ^ hO)
            + _popcount_rows(e0 ^ e_ext[1:R + 1] ^ vE)
            + _popcount_rows(o0 ^ o_ext[1:R + 1] ^ vO))
    return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)


def bit1_energy_row_sums(black_w, white_w, links_words=None,
                         row_chunk: int = 8192):
    """energy_row_sums computed directly on bit1 word storage.

    links_words: optional (vE, vO, hE, hO) parity-split link flag planes in
    the same word layout (driver.build_disorder's packed store) — the
    disordered energy then also runs without any decode."""
    Y = black_w.shape[0]
    R = min(Y, row_chunk)
    while Y % R:
        R -= 2
    parts = []
    for r in range(0, Y, R):
        e_ext, o_ext = _col_parity_planes(_rows_wrap(black_w, r, R + 1),
                                          _rows_wrap(white_w, r, R + 1))
        if links_words is None:
            parts.append(_bit1_energy_block(e_ext, o_ext))
        else:
            vE, vO, hE, hO = (p[r:r + R] for p in links_words)
            parts.append(_bit1_energy_block_dis(e_ext, o_ext, vE, vO,
                                                hE, hO))
        if R < Y:
            _fence(parts[-1])
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


@functools.partial(jax.jit, static_argnames=("corr_len",))
def _bit1_corr_block(e_ext, o_ext, corr_len: int):
    """Word-domain analog of _corr_block (full-lattice wrap only)."""
    R = e_ext.shape[0] - corr_len
    ncols = 2 * 32 * e_ext.shape[1]
    e0, o0 = e_ext[:R], o_ext[:R]

    def one(d):
        dh = d // 2
        deven = (d % 2) == 0
        if_even = lambda a, b: a if deven else b
        hx1 = e0 ^ _col_shift_words(if_even(e0, o0), if_even(dh, dh))
        hx2 = o0 ^ _col_shift_words(if_even(o0, e0), if_even(dh, dh + 1))
        vx1 = e0 ^ e_ext[d:R + d]
        vx2 = o0 ^ o_ext[d:R + d]
        anti = (_popcount_rows(hx1) + _popcount_rows(hx2)
                + _popcount_rows(vx1) + _popcount_rows(vx2))
        return jnp.int32(2 * ncols) - 2 * anti.astype(jnp.int32)

    return jnp.stack([one(d) for d in range(1, corr_len + 1)])


def bit1_correlation_row_sums(black_w, white_w,
                              corr_len: int = MAX_CORR_LEN,
                              row_chunk: int = 8192):
    """correlation_row_sums computed directly on bit1 word storage."""
    Y = black_w.shape[0]
    R = min(Y, row_chunk)
    while Y % R:
        R -= 2
    parts = []
    for r in range(0, Y, R):
        e_ext, o_ext = _col_parity_planes(
            _rows_wrap(black_w, r, R + corr_len),
            _rows_wrap(white_w, r, R + corr_len))
        parts.append(_bit1_corr_block(e_ext, o_ext, corr_len))
        if R < Y:
            _fence(parts[-1])
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]


@functools.partial(jax.jit, static_argnames=("field_mask",))
def _popcount_up_block(b, w, field_mask: int):
    m = jnp.uint32(field_mask)
    return (jnp.sum(jax.lax.population_count(b & m).astype(jnp.uint32),
                    axis=1)
            + jnp.sum(jax.lax.population_count(w & m).astype(jnp.uint32),
                      axis=1))


def word_row_up_counts(black_w, white_w, field_mask: int = 0xFFFFFFFF,
                       row_chunk: int = 16384):
    """Per-row up-spin counts on word storage, jit-fused and row-chunked.

    One jitted popcount+reduce per slab: fusion keeps the popcount
    intermediate out of HBM, and per-slab fencing bounds live transients —
    measured necessary at 131072x65536 with ~7.5 GB of disorder planes
    resident (the unfused one-shot materialized full popcount planes on
    top and hit the allocator ceiling).
    """
    Y = black_w.shape[0]
    if Y <= row_chunk:
        return _popcount_up_block(black_w, white_w, field_mask)
    parts = []
    for r in range(0, Y, row_chunk):
        parts.append(_popcount_up_block(black_w[r:r + row_chunk],
                                        white_w[r:r + row_chunk],
                                        field_mask))
        _fence(parts[-1])  # loop only runs when Y > row_chunk: always chunked
    return jnp.concatenate(parts)


def packed_row_up_counts(black_w, white_w):
    """row_up_counts computed directly on packed uint32 storage.

    The popcount path of the reference's getMagn_k (optimized/main.cu:702-734
    via __popc): mask each word to its fields' low bits and popcount, without
    unpacking 8x to bit planes.
    """
    return word_row_up_counts(black_w, white_w, field_mask=0x11111111)


# ----------------------------------------------------------------------------
# Replica overlap: the Edwards-Anderson order parameter's integer core.
# q = (1/N) sum_i s^(1)_i s^(2)_i = 1 - 2 * neq / N where neq counts the
# sites where two states differ — so the device-side partial is a per-row
# XOR count, exact integers like every other observable here. Beyond the
# reference: its spin-glass support (-J) measures only magnetization and
# energy of a single replica (optimized/main.cu:1374-1378); P(q) and the
# overlap Binder ratio are THE spin-glass observables.

@jax.jit
def _neq_block(b1, w1, b2, w2):
    return (jnp.sum((b1 ^ b2).astype(jnp.uint32), axis=1)
            + jnp.sum((w1 ^ w2).astype(jnp.uint32), axis=1))


def overlap_neq_rows_via(decode_a, decode_b, nrows: int,
                         row_chunk: int = 8192):
    """Per-row differing-spin counts between two states, streamed from
    storage via each state's decode callback (decode(r, n) -> compact 0/1
    byte planes for rows [r, r+n)) — O(chunk) transients at giant shapes,
    same slab discipline as energy_rows_via."""
    Y = nrows
    R = min(Y, row_chunk)
    while Y % R:
        R -= 2
    parts = []
    for r in range(0, Y, R):
        b1, w1 = decode_a(r, R)
        b2, w2 = decode_b(r, R)
        parts.append(_neq_block(b1, w1, b2, w2))
        if R < Y:
            _fence(parts[-1])
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


@functools.partial(jax.jit, static_argnames=("field_mask",))
def _word_neq_block(b1, w1, b2, w2, field_mask: int):
    m = jnp.uint32(field_mask)
    return (jnp.sum(jax.lax.population_count((b1 ^ b2) & m)
                    .astype(jnp.uint32), axis=1)
            + jnp.sum(jax.lax.population_count((w1 ^ w2) & m)
                      .astype(jnp.uint32), axis=1))


def word_overlap_neq_rows(b1, w1, b2, w2, field_mask: int = 0xFFFFFFFF,
                          row_chunk: int = 16384):
    """Per-row differing-spin counts straight on word storage (bit1: every
    bit is a spin; packed: mask the nibble low bits like
    packed_row_up_counts) — XOR + popcount, no decode."""
    Y = b1.shape[0]
    if Y <= row_chunk:
        return _word_neq_block(b1, w1, b2, w2, field_mask)
    parts = []
    for r in range(0, Y, row_chunk):
        s = slice(r, r + row_chunk)
        parts.append(_word_neq_block(b1[s], w1[s], b2[s], w2[s], field_mask))
        _fence(parts[-1])
    return jnp.concatenate(parts)


# ----------------------------------------------------------------------------
# Column-axis partials: the Fourier-magnetization inputs. Per-column up
# counts are the column twin of row_up_counts; together they carry the exact
# integer content of m(0) and of the smallest-wavevector magnetization
# m(k1 = 2*pi/L) along either axis (the phase dot is a host-side float64
# finish, analysis.kmin_mag2), from which the second-moment correlation
# length follows without materializing any spin plane or FFT. New capability
# beyond the reference (whose only length observable is the direct-space
# correlation function, optimized/main.cu:870-1070).

@jax.jit
def _col_up_block(black, white):
    """Per-full-lattice-column up counts of one row slab, uint32 (X,)."""
    e, o = _col_parity_planes(black, white)
    ce = jnp.sum(e.astype(jnp.uint32), axis=0)
    co = jnp.sum(o.astype(jnp.uint32), axis=0)
    # Full column 2j is the E plane's column j, 2j+1 the O plane's.
    return jnp.stack([ce, co], axis=1).reshape(-1)


def _col_chunked(block, a, b, nrows: int, row_chunk: int):
    """Accumulate a per-column block reduction over even-aligned row slabs.

    Slabs start at even rows so each slab's local row parity equals the
    global parity _col_parity_planes needs. Per-column totals stay exact in
    uint32 at any supported height (Y <= 2^20 << 2^32)."""
    R = min(nrows, row_chunk - (row_chunk % 2))
    if nrows <= R:
        return block(a, b)
    acc = None
    for r in range(0, nrows, R):
        part = block(a[r:r + R], b[r:r + R])
        acc = part if acc is None else acc + part
        _fence(acc)
    return acc


def col_up_counts(black, white, row_chunk: int = 8192):
    """Per-column count of up spins over the full lattice, uint32 (X,)."""
    return _col_chunked(_col_up_block, black, white, black.shape[0],
                        row_chunk)


def col_up_counts_via(decode_rows, nrows: int, row_chunk: int = 8192):
    """col_up_counts from backend storage via a row decoder callback
    (decode_rows(r, n) -> compact (black, white) planes for rows [r, r+n))
    — no full-lattice decode ever materializes."""
    Y = nrows
    R = min(Y, row_chunk)
    while Y % R:
        R -= 2
    acc = None
    for r in range(0, Y, R):
        part = _col_up_block(*decode_rows(r, R))
        acc = part if acc is None else acc + part
        if R < Y:
            _fence(acc)
    return acc


@jax.jit
def _bit1_col_up_block(black_w, white_w):
    """Word-domain per-column up counts of one row slab (bit1 storage).

    Bit g of word lane j is compact column g*W1 + j (the lane-concat
    layout, see _col_shift_words), so extracting bit plane g and reducing
    rows yields the counts of W1 consecutive compact columns."""
    e, o = _col_parity_planes(black_w, white_w)

    def percol(x):
        return jnp.concatenate(
            [jnp.sum(((x >> g) & jnp.uint32(1)).astype(jnp.uint32), axis=0)
             for g in range(32)])

    return jnp.stack([percol(e), percol(o)], axis=1).reshape(-1)


def bit1_col_up_counts(black_w, white_w, row_chunk: int = 8192):
    """col_up_counts computed directly on bit1 word storage (no decode)."""
    return _col_chunked(_bit1_col_up_block, black_w, white_w,
                        black_w.shape[0], row_chunk)


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
