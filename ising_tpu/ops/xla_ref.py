"""Reference checkerboard sweep in pure jax.numpy (backend "xla").

The semantic ground truth for every other backend: a direct, fusion-friendly
XLA expression of the same update the reference performs one thread per site
(basic_cuda/main.cu:54-90, basic_python/ising_basic.py:106-134):

    4-neighbor bit sum of the opposite color  ->  threshold lookup
    ->  accept iff draw <= thr  ->  flip via XOR.

Runs on CPU (CI), TPU, any XLA target. Supports halos (for sharding),
sub-lattice replica wrap (reference --xsl/--ysl, optimized/main.cu:1423-1463)
via static gather maps, and quenched +-J disorder via per-neighbor XOR planes
(the TPU analog of the packed J-XOR, optimized/main.cu:575-618).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..constants import BLACK
from ..rng import TAG_SWEEP, counter_color_draws, plane_bits


def make_row_wrap_maps(nrows: int, ysl: int):
    """Static row index maps wrapping vertically inside ysl-row sub-lattices."""
    i = np.arange(nrows)
    up = np.where(i % ysl != 0, i - 1, i + ysl - 1)
    dn = np.where((i + 1) % ysl != 0, i + 1, i - ysl + 1)
    return jnp.asarray(up), jnp.asarray(dn)


def make_col_wrap_maps(ncols_half: int, xsl: int):
    """Static compact-column maps wrapping horizontally inside sub-lattices."""
    csl = xsl // 2
    j = np.arange(ncols_half)
    left = np.where(j % csl != 0, j - 1, j + csl - 1)
    right = np.where((j + 1) % csl != 0, j + 1, j - csl + 1)
    return jnp.asarray(left), jnp.asarray(right)


def select_threshold(dst_bits, nsum, thr10):
    """Per-site uint32 acceptance threshold via the mirrored count.

    e = b ? n : 4-n collapses the 2x5 table to three entries (e=2/3/4 ->
    thr10[7]/[8]/[9]; e<2 always accepts). Exactly equivalent to indexing
    thr10[b*5+n] because thr10[0*5+n] == thr10[1*5+(4-n)] by construction
    (identical float expressions), but selects instead of gathering — TPU
    gathers are slow, and this mirrors the packed kernel's logic.
    """
    e = jnp.where(dst_bits.astype(jnp.int32) == 1,
                  nsum.astype(jnp.int32), 4 - nsum.astype(jnp.int32))
    return jnp.where(e < 2, jnp.uint32(0xFFFFFFFF),
                     jnp.where(e == 2, thr10[7],
                               jnp.where(e == 3, thr10[8], thr10[9])))


def select_threshold_full(dst_bits, nsum, thr10):
    """Per-site uint32 threshold from the FULL 2x5 table.

    External-field runs: h != 0 breaks the thr10[0*5+n] == thr10[1*5+(4-n)]
    mirror symmetry select_threshold exploits, so both own-bit rows are
    selected explicitly (still select chains, not a gather — same TPU
    rationale)."""
    n = nsum.astype(jnp.int32)

    def row(base):
        return jnp.where(n == 0, thr10[base + 0],
               jnp.where(n == 1, thr10[base + 1],
               jnp.where(n == 2, thr10[base + 2],
               jnp.where(n == 3, thr10[base + 3], thr10[base + 4]))))

    return jnp.where(dst_bits.astype(jnp.int32) == 1, row(5), row(0))


def neighbor_bit_sum(src, *, color: int, H: int,
                     src_up=None, src_dn=None,
                     src_left=None, src_right=None,
                     row_idx_up=None, row_idx_dn=None,
                     col_idx_left=None, col_idx_right=None,
                     jplanes=None):
    """4-neighbor bit sum (0..4) of the opposite-color plane, per dst site.

    src_up/src_dn: (1, C) halo rows above/below this slab; for a single
        unsharded lattice pass src[-1:] and src[:1].
    src_left/src_right: optional (H, 1) halo COLUMNS beside this block
        (2-D block decomposition, parallel/block2d.py); when absent the
        horizontal wrap is the local periodic roll.
    row/col index maps: optional static gathers replacing the periodic wrap
        (sub-lattice replica mode). When row maps are given, halos are unused.
    jplanes: optional (j_up, j_dn, j_same, j_off) uint8 antiferro flags for
        the dst color; neighbor bits are XORed before summing.

    Requires even slab heights so local row parity equals global row parity
    (the reference imposes the same constraint, basic_python/ising_basic.py:61).
    """
    if row_idx_up is not None:
        up = jnp.take(src, row_idx_up, axis=0)
        dn = jnp.take(src, row_idx_dn, axis=0)
    else:
        up = jnp.concatenate([src_up, src[:-1]], axis=0)
        dn = jnp.concatenate([src[1:], src_dn], axis=0)
    if col_idx_left is not None:
        left = jnp.take(src, col_idx_left, axis=1)
        right = jnp.take(src, col_idx_right, axis=1)
    elif src_left is not None:
        left = jnp.concatenate([src_left, src[:, :-1]], axis=1)
        right = jnp.concatenate([src[:, 1:], src_right], axis=1)
    else:
        left = jnp.roll(src, 1, axis=1)
        right = jnp.roll(src, -1, axis=1)

    row_odd = (jnp.arange(H, dtype=jnp.int32) % 2 == 1)[:, None]
    same = src
    # Off-column neighbor: black even rows look left, odd rows right;
    # white mirrored (basic_cuda/main.cu:73-79).
    if color == BLACK:
        off = jnp.where(row_odd, right, left)
    else:
        off = jnp.where(row_odd, left, right)

    if jplanes is not None:
        j_up, j_dn, j_same, j_off = jplanes
        up = up ^ j_up
        dn = dn ^ j_dn
        same = same ^ j_same
        off = off ^ j_off

    return up + dn + same + off  # bit sum in 0..4, fits uint8


def sweep_color(dst, src, *, color: int, thr10, draws,
                src_up=None, src_dn=None, jplanes=None,
                full_table: bool = False, **maps):
    """One Metropolis half-sweep: update every `dst` site of one color.

    dst/src: compact (H, C) uint8 bit planes (dst color / opposite color).
    thr10:   uint32 (10,) acceptance thresholds [own_bit*5 + neighbor_sum].
    draws:   uint32 (H, C) per-site random draws.
    full_table: use the full 2x5 table (external-field runs, where the
        h = 0 mirror symmetry does not hold).
    """
    H, C = dst.shape
    nsum = neighbor_bit_sum(src, color=color, H=H, src_up=src_up,
                            src_dn=src_dn, jplanes=jplanes, **maps)
    pick = select_threshold_full if full_table else select_threshold
    thr = pick(dst, nsum, thr10)
    accept = (draws <= thr).astype(jnp.uint8)
    return dst ^ accept


def sweep_color_planes_field(dst, src, *, color: int, v, t10,
                             src_up=None, src_dn=None, jplanes=None, **maps):
    """Half-sweep, bit-plane contract with external field: the 10-class
    bit-serial accept evaluated densely.

    v:   (H, C) uint32 k-bit uniforms assembled LSB-first from the plane
         draws (same bits the bit1 kernel's _bitserial_field_flip consumes).
    t10: uint32 (10,) static table [own_bit*5 + n] where always-flip
         classes hold 2^k (v < 2^k is identically true for a k-bit v) and
         stochastic classes hold ising.field_kbit_thresholds' values —
         flip iff v < t (STRICT), bit-identical to the bit-serial chains.
    """
    H, C = dst.shape
    nsum = neighbor_bit_sum(src, color=color, H=H, src_up=src_up,
                            src_dn=src_dn, jplanes=jplanes, **maps)
    thr = select_threshold_full(dst, nsum, t10)
    return dst ^ (v < thr).astype(jnp.uint8)


def sweep_color_planes(dst, src, *, color: int, lt4, lt8, coin,
                       greedy: bool, src_up=None, src_dn=None,
                       jplanes=None, **maps):
    """Half-sweep under the bit-plane contract ("...b" rng modes).

    lt4/lt8/coin: (H, C) uint8 Bernoulli bits (v < t4k, v < t8k, fair coin)
    unpacked from the bit-serial plane compare — must match the bit1
    kernel's _bitserial_lt_planes consumption bit for bit.
    """
    H, C = dst.shape
    nsum = neighbor_bit_sum(src, color=color, H=H, src_up=src_up,
                            src_dn=src_dn, jplanes=jplanes, **maps)
    e = jnp.where(dst.astype(jnp.int32) == 1,
                  nsum.astype(jnp.int32), 4 - nsum.astype(jnp.int32))
    if greedy:
        # T <= 0 quench: dE < 0 accepts, dE == 0 coin-flips, dE > 0 rejects
        # (lt4/lt8 are all-zero since both thresholds are 0).
        flip = ((e < 2) | ((e == 2) & (coin == 1))
                | ((e == 3) & (lt4 == 1)) | ((e == 4) & (lt8 == 1)))
    else:
        flip = (e < 3) | ((e == 3) & (lt4 == 1)) | ((e == 4) & (lt8 == 1))
    return dst ^ flip.astype(jnp.uint8)


class XlaBackend:
    """Backend adapter: plain uint8 bit-plane storage, pure-XLA sweep."""

    name = "xla"
    bytes_per_spin = 1.0  # uint8 bit planes

    def __init__(self, cfg):
        self.cfg = cfg
        ch = cfg.ncols // 2
        self._maps = {}
        if cfg.ysl:
            self._maps["row_idx_up"], self._maps["row_idx_dn"] = \
                make_row_wrap_maps(cfg.local_rows, cfg.ysl)
        if cfg.xsl:
            self._maps["col_idx_left"], self._maps["col_idx_right"] = \
                make_col_wrap_maps(ch, cfg.xsl)
        # External field: u32 modes consume the full 2x5 runtime table;
        # plane modes use the static 10-class bit-serial thresholds below.
        # The driver updates full_table/field on set_field (and rebuilds
        # the stepper when the accept variant changes trace-time shape).
        self.full_table = cfg.field != 0.0
        self.field = cfg.field
        self.kplanes = plane_bits(cfg.rng)
        if self.kplanes:
            if ch % 32:
                raise ValueError(
                    "bit-plane rng modes (...b) need ncols % 64 == 0 "
                    "(one random bit-plane word covers 32 compact columns)")
            # Static k-bit thresholds; the driver rebuilds the stepper on
            # temperature changes (same machinery as bit1-hw).
            self.temp_static = True
            self.temperature = cfg.temperature
            self.greedy = cfg.temperature <= 0

    # Storage is the logical bit planes themselves.
    def encode(self, black_bits, white_bits):
        return black_bits, white_bits

    def decode(self, black_store, white_store):
        return black_store, white_store

    def update_color(self, dst, src, *, color, thr10, step, row0=0,
                     src_up=None, src_dn=None, jplanes=None):
        H, C = dst.shape
        if self.kplanes:
            # Bit-plane contract: same draw block, plane slicing, bit-serial
            # compare and static thresholds as the bit1 kernel — unpacked to
            # per-site Bernoulli bits for the dense-plane sweep.
            from ..models import ising
            from .pallas_bit1 import _bitserial_lt_planes, unpack_bits1
            k = self.kplanes
            W1 = C // 32
            draws = counter_color_draws(
                self.cfg.rng, self.cfg.seed, H, k * W1, step=step,
                tag=TAG_SWEEP | color, row0=row0, row_stride=k * W1)
            if self.field:
                # 10-class bit-serial accept (same static table as the
                # bit1 kernel's field path): assemble the k-bit uniform
                # per site and compare against the per-class threshold.
                tvals10, always10 = ising.field_kbit_thresholds(
                    self.temperature, self.field, k)
                t10 = jnp.asarray(np.array(
                    [(1 << k) if (always10 >> c) & 1 else tvals10[c]
                     for c in range(10)], dtype=np.uint32))
                v = unpack_bits1(draws[:, :W1]).astype(jnp.uint32)
                for z in range(1, k):
                    v = v | (unpack_bits1(
                        draws[:, z * W1:(z + 1) * W1]).astype(jnp.uint32)
                        << z)
                return sweep_color_planes_field(
                    dst, src, color=color, v=v, t10=t10, src_up=src_up,
                    src_dn=src_dn, jplanes=jplanes, **self._maps)
            t4k, t8k = ising.bernoulli_kbit_thresholds(self.temperature, k)
            lt4w, lt8w, coinw = _bitserial_lt_planes(draws, W1, k, t4k, t8k)
            return sweep_color_planes(
                dst, src, color=color, lt4=unpack_bits1(lt4w),
                lt8=unpack_bits1(lt8w), coin=unpack_bits1(coinw),
                greedy=self.greedy, src_up=src_up, src_dn=src_dn,
                jplanes=jplanes, **self._maps)
        draws = counter_color_draws(self.cfg.rng, self.cfg.seed, H, C,
                                    step=step, tag=TAG_SWEEP | color,
                                    row0=row0, row_stride=C)
        return sweep_color(dst, src, color=color, thr10=thr10, draws=draws,
                           src_up=src_up, src_dn=src_dn, jplanes=jplanes,
                           full_table=self.full_table, **self._maps)
