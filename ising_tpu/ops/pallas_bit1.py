"""Pallas TPU kernel, 1-bit tier (backend "bit1") — the speed flagship.

Measured motivation (PERF.md round 2): the 4-bit packed kernel is purely
HBM-bound on v5e — pure 3-stream word traffic costs 0.624 ms/step at
16384^2 and the real kernel 0.670, i.e. ALL compute (stencil + RNG +
acceptance) hides under the memory stream. The only remaining lever is
traffic, so this tier stores ONE bit per spin (the information-theoretic
minimum; the reference's densest layout is 4 bits/spin,
optimized/main.cu:40) and computes the neighbor sums bit-sliced:

  * storage: compact color plane (Y, C=X/2) -> (Y, W1=C/32) uint32, bit g
    of word j = spin at compact column g*W1 + j (lane-concat groups, same
    scheme as the 4-bit tier's fields so the off-column neighbor is a lane
    roll + one group-boundary fix);
  * neighbor sums: a 4-input bit-sliced adder network (11 bitwise ops per
    32 spins) instead of whole-word 4-bit adds;
  * acceptance classes: e = b ? n : 4-n evaluated directly as bit-plane
    predicates (e>=3, e>=4, and e==2 for the greedy quench) — no field
    masks, every bit is a spin;
  * per-spin uint32 draws and the two threshold compares are identical to
    the other backends (same counter contract, same plane slicing), so
    counter-rng trajectories are bit-identical to xla/dense/packed/mxu;
  * per color phase the HBM traffic is 3 x C/8 bytes/row: 6 bit-planes per
    step = 0.375 bytes/spin-update vs the packed tier's 1.5.

Quenched +-J disorder rides as four 1-bit direction-flag planes in the
same word layout (XORed into the neighbor planes before the adder — the
bit-sliced analog of the packed tier's J word, +0.5 B/spin-update of
traffic). Sub-lattice replicas (reference --xsl/--ysl,
optimized/main.cu:413-458,1423-1463) are supported when the compact
sub-lattice width csl = xsl/2 divides W1 = ncols/64: compact col
c = g*W1 + j has c % csl == j % csl for every bit group g, so the
horizontal wrap is the packed tier's dual lane roll verbatim and the
vertical wrap rides the block edge arrays. Wider xsl routes to "packed"
(whose layout admits csl up to ncols/16). Multi-device slab sharding is
inherited from the shared stepper machinery.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLACK
from ..rng import TAG_SWEEP, parse_rng_mode, plane_bits
from .pallas_dense import _block_rows_for
from .pallas_packed import (_chacha_draw_block, _draw_plane_list,
                            _hw_draw_block, _philox_draw_block,
                            _threefry_draw_block)

SPW = 32  # spins per uint32 word


def pack_bits1(bits):
    """(Y, C) uint8 bit plane -> (Y, W1=C/32) uint32, bit g = col g*W1+j."""
    Y, C = bits.shape
    W1 = C // SPW
    g = bits.reshape(Y, SPW, W1).astype(jnp.uint32)
    out = jnp.zeros((Y, W1), jnp.uint32)
    for z in range(SPW):
        out = out | (g[:, z, :] << z)
    return out


def unpack_bits1(packed):
    """(Y, W1) uint32 -> (Y, 32*W1) uint8 bit plane."""
    Y, W1 = packed.shape
    planes = [((packed >> z) & 1).astype(jnp.uint8) for z in range(SPW)]
    return jnp.stack(planes, axis=1).reshape(Y, SPW * W1)


def words_to_packed_rows(words):
    """(Y, W1) uint32 bit1 words -> (Y, 4*W1) uint8, np.packbits byte order.

    Produces the EXACT bytes checkpoint._pack_rows(unpack_bits1(words))
    would, without materializing the 8x-larger decoded byte plane: the v2
    checkpoint file stays byte-identical and cross-backend portable, but a
    bit1 save is a pure word-domain bit shuffle (col g*W1 + j = bit g of
    word j; with W1 % 8 == 0 every output byte reads one bit of 8
    consecutive words of a single plane bit g)."""
    Y, W1 = words.shape
    if W1 % 8:
        raise ValueError("word-domain packing needs W1 % 8 == 0 "
                         "(ncols % 512)")
    gw = words.reshape(Y, W1 // 8, 8)
    out = []
    for g in range(SPW):
        b = (gw >> g) & 1
        acc = b[:, :, 0] << 7
        for i in range(1, 8):
            acc = acc | (b[:, :, i] << (7 - i))
        out.append(acc.astype(jnp.uint8))
    return jnp.concatenate(out, axis=1)


def packed_rows_to_words(packed, W1: int):
    """(Y, 4*W1) uint8 packed bytes (np.packbits order) -> (Y, W1) uint32
    bit1 words — the resume-side inverse of words_to_packed_rows (upload
    the file bytes, shuffle to storage on device, never a byte plane)."""
    Y = packed.shape[0]
    if W1 % 8:
        raise ValueError("word-domain unpacking needs W1 % 8 == 0")
    pg = jnp.asarray(packed).reshape(Y, SPW, W1 // 8).astype(jnp.uint32)
    bits = jnp.stack([(pg >> (7 - i)) & 1 for i in range(8)], axis=3)
    w = jnp.zeros((Y, W1 // 8, 8), jnp.uint32)
    for g in range(SPW):
        w = w | (bits[:, g] << g)
    return w.reshape(Y, W1)


def _neighbor_adder(up, dn, same, off):
    """4-input bit-sliced carry-save adder: neighbor-up count n = n2 n1 n0
    as three bit planes (11 bitwise ops per 32 spins)."""
    t0 = up ^ dn
    c0 = up & dn
    t1 = same ^ off
    c1 = same & off
    n0 = t0 ^ t1
    c2 = t0 & t1
    n1 = c0 ^ c1 ^ c2
    n2 = (c0 & c1) | (c2 & (c0 ^ c1))  # n == 4 (majority of carries)
    return n0, n1, n2


def _neighbor_class_masks(me, up, dn, same, off):
    """Bit-plane predicates (ge3, ge4, eq2) of the mirrored count
    e = b ? n : 4 - n, from the bit-sliced adder (h = 0 fast path)."""
    n0, n1, n2 = _neighbor_adder(up, dn, same, off)
    # e >= 3  <=>  b ? n >= 3 : n <= 1;   e >= 4  <=>  b ? n == 4 : n == 0
    n_ge3 = n2 | (n1 & n0)
    n_le1 = ~(n2 | n1)
    n_eq0 = n_le1 & ~n0
    ge3 = (me & n_ge3) | (~me & n_le1)
    ge4 = (me & n2) | (~me & n_eq0)
    # e == 2  <=>  n == 2 (4 - n == 2 likewise): n2=0, n1=1, n0=0
    eq2 = ~n2 & n1 & ~n0
    return ge3, ge4, eq2


def _bitserial_lt_planes(draws, W1: int, kbits: int, t4k: int, t8k: int):
    """(lt4, lt8, coin) bit-planes: v < t for both thresholds, bit-serially.

    draws is (BY, kbits*W1) — or already a LIST of kbits (BY, W1) plane
    arrays (the Pallas kernels hand the generator output words over
    directly; a concat -> re-slice round trip costs real VMEM copies
    under Mosaic, PERF.md round 5). Plane z supplies one
    i.i.d. random bit per spin. Processing planes LSB-first, the strict
    compare "v < t" obeys  a' = t_z ? (~u | a) : (~u & a)  — the threshold
    bits are STATIC, so each plane costs one ~ shared by both accumulators
    plus one |/& each, with no per-spin compare, no weight select and no
    OR-pack tree. Runs of planes whose (t4, t8) bit PAIR repeats fold into
    one combined chain (bitwise-identical output, fewer ops):

        a &= ~u1; a &= ~u2; ...  ==  a &= ~(u1 | u2 | ...)
        a |= ~u1; a |= ~u2; ...  ==  a |= ~(u1 & u2 & ...)

    which matters because real thresholds have long same-pair runs (both
    classes' high bits are zero below T_c). The coin plane (greedy dE == 0
    half-accept) reuses plane 0: its class is disjoint from the thresholded
    classes, so per spin only one of the three variables is ever consumed.
    """
    planes = draws if isinstance(draws, (list, tuple)) else \
        [draws[:, z * W1:(z + 1) * W1] for z in range(kbits)]
    coin = planes[0]

    a4 = a8 = None
    z = 0
    while z < kbits:
        pair = ((t4k >> z) & 1, (t8k >> z) & 1)
        z2 = z
        while z2 < kbits and ((t4k >> z2) & 1, (t8k >> z2) & 1) == pair:
            z2 += 1
        run = planes[z:z2]
        fand = for_ = None  # computed at most once per run, shared
        for bit, a, set_ in ((pair[0], a4, 0), (pair[1], a8, 1)):
            if bit:
                if fand is None:
                    fand = run[0]
                    for u in run[1:]:
                        fand = fand & u
                new = ~fand if a is None else (~fand | a)
            elif a is None:
                new = None
            else:
                if for_ is None:
                    for_ = run[0]
                    for u in run[1:]:
                        for_ = for_ | u
                new = a & ~for_
            if set_ == 0:
                a4 = new
            else:
                a8 = new
        z = z2
    zero = jnp.zeros_like(planes[0])
    return (a4 if a4 is not None else zero,
            a8 if a8 is not None else zero, coin)


def _bitserial_field_flip(draws, me, n0, n1, n2, W1: int, kbits: int,
                          tvals10: tuple, always10: int):
    """Flip plane for the external-field accept (the 10-class bit-serial
    path; contract: models.ising.field_kbit_thresholds).

    h != 0 breaks the mirror symmetry behind _bitserial_lt_planes' two
    accumulator chains, but the bit-serial machinery generalizes: instead
    of per-class chains, build per-PLANE threshold-bit masks T_z = OR of
    the stochastic class masks whose static k-bit threshold has bit z set,
    and drive ONE strict less-than accumulator with a per-spin threshold:

        lt' = (T_z & ~u) | (~(T_z ^ u) & lt)      (LSB-first)

    Every spin belongs to exactly one (own bit, neighbor count) class;
    deterministic classes (dE <= 0, the `always10` mask) flip outright
    and contribute to no T_z, so their lt stays 0 and
    flip = always_mask | lt. Cost: ~6 vector ops per plane plus the
    one-off class masks — vs 3/plane for the h = 0 two-threshold chains.
    """
    notme = ~me
    n_eq = (
        ~n2 & ~n1 & ~n0,   # n == 0
        ~n2 & ~n1 & n0,    # n == 1
        ~n2 & n1 & ~n0,    # n == 2
        n1 & n0,           # n == 3 (n2 = 1 only at n = 4, where n1 = n0 = 0)
        n2,                # n == 4
    )
    stoch = []             # (class mask, static threshold) for p < 1
    amask = None
    for cls in range(10):
        m = (me if cls >= 5 else notme) & n_eq[cls % 5]
        if (always10 >> cls) & 1:
            amask = m if amask is None else (amask | m)
        elif tvals10[cls]:
            stoch.append((m, tvals10[cls]))
        # p rounding to 0: the class never flips; contributes nothing.
    planes = draws if isinstance(draws, (list, tuple)) else \
        [draws[:, z * W1:(z + 1) * W1] for z in range(kbits)]
    lt = None
    for z in range(kbits):
        members = [m for m, t in stoch if (t >> z) & 1]
        u = planes[z]
        if not members:
            # T_z == 0 everywhere: lt' = ~u & lt.
            lt = None if lt is None else (lt & ~u)
            continue
        T = members[0]
        for m in members[1:]:
            T = T | m
        nu = ~u
        lt = (T & nu) if lt is None else ((T & nu) | (~(T ^ u) & lt))
    zero = jnp.zeros_like(me)
    if lt is None:
        lt = zero
    if amask is None:
        amask = zero
    return amask | lt


def _bit1_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                 *rest, color: int, row_block: int, seed: int,
                 rng_mode: str, interp: bool, greedy: bool,
                 disorder: bool = False, split_links: bool = False,
                 csl: int | None = None,
                 t4k: int = 0, t8k: int = 0, kbits: int = 24,
                 grows: int = 0, tvals10: tuple | None = None,
                 always10: int = 0):
    out_ref = rest[-1]
    BY = row_block
    W1 = dst_ref.shape[1]
    C = SPW * W1
    i = pl.program_id(0)

    me = dst_ref[...]
    src = src_ref[...]
    up_row = up_ref[pl.ds(i, 1), :]
    dn_row = dn_ref[pl.ds(i, 1), :]
    up = jnp.concatenate([up_row, src[:-1]], axis=0)
    dn = jnp.concatenate([src[1:], dn_row], axis=0)

    # Off-column neighbors: compact col g*W1 + j; col-1 is lane j-1 of the
    # same bit except at j == 0, where it wraps to lane W1-1 one bit down
    # (and bit 0 lane 0 wraps to bit 31 lane W1-1). Mirror for col+1.
    lane = jax.lax.broadcasted_iota(jnp.int32, (BY, W1), 1)
    if csl is None:
        last = src[:, W1 - 1:W1]
        wrapL = (last << 1) | (last >> 31)
        left = jnp.where(lane == 0, wrapL, pltpu.roll(src, 1, 1))
        first = src[:, 0:1]
        wrapR = (first >> 1) | (first << 31)
        right = jnp.where(lane == W1 - 1, wrapR, pltpu.roll(src, W1 - 1, 1))
    else:
        # Sub-lattice replica wrap: csl | W1, so col c % csl == lane % csl
        # in every bit group and the wrap never crosses a bit boundary —
        # a second lane roll selected at sub-lattice edge lanes (the same
        # construction as the packed tier's csl path).
        left = jnp.where(lane % csl == 0,
                         pltpu.roll(src, (W1 - csl + 1) % W1, 1),
                         pltpu.roll(src, 1, 1))
        right = jnp.where(lane % csl == csl - 1,
                          pltpu.roll(src, csl - 1, 1),
                          pltpu.roll(src, W1 - 1, 1))
    odd = (jax.lax.broadcasted_iota(jnp.int32, (BY, W1), 0) % 2) == 1
    off = jnp.where(odd, right, left) if color == BLACK \
        else jnp.where(odd, left, right)

    same = src
    if disorder and split_links:
        # Derive this color's four direction-flag planes IN-KERNEL from the
        # parity-split link store (vE, vO, hE, hO: the v/h antiferro flag
        # at full-lattice column 2c / 2c+1). This is links_to_color_planes
        # evaluated on words: ~10 vector ops per word, hidden under the
        # PRNG-bound kernel, and it removes the 3x-redundant resident
        # jb/jw planes (the disorder store shrinks from 4 to 2 bits/site
        # overall — what unlocked 131072x65536 disordered runs).
        vE, vO, hE, hO = (r[...] for r in rest[:4])
        vupE_row = rest[4][pl.ds(i, 1), :]
        vupO_row = rest[5][pl.ds(i, 1), :]
        vEu = jnp.concatenate([vupE_row, vE[:-1]], axis=0)  # v rows y-1
        vOu = jnp.concatenate([vupO_row, vO[:-1]], axis=0)

        def roll_left(p):
            # word plane of compact col c-1 (periodic), same wrap as the
            # off-column neighbor's left roll
            lastp = p[:, W1 - 1:W1]
            wrap = (lastp << 1) | (lastp >> 31)
            return jnp.where(lane == 0, wrap, pltpu.roll(p, 1, 1))

        # col_color(y, c) is even (the E plane) iff row parity matches the
        # color: black sits on even columns of even rows.
        if color == BLACK:
            j_dn = jnp.where(odd, vO, vE)
            j_up = jnp.where(odd, vOu, vEu)
            j_right = jnp.where(odd, hO, hE)
            j_left = jnp.where(odd, hE, roll_left(hO))
            same_is_right = ~odd
        else:
            j_dn = jnp.where(odd, vE, vO)
            j_up = jnp.where(odd, vEu, vOu)
            j_right = jnp.where(odd, hE, hO)
            j_left = jnp.where(odd, roll_left(hO), hE)
            same_is_right = odd
        j_same = jnp.where(same_is_right, j_right, j_left)
        j_off = jnp.where(same_is_right, j_left, j_right)
        up = up ^ j_up
        dn = dn ^ j_dn
        same = same ^ j_same
        off = off ^ j_off
    elif disorder:
        # Quenched +-J: the four direction flags ride as 1-bit planes in
        # the same word layout; neighbor XOR stays one vector op per plane
        # (the bit-sliced analog of the packed tier's J-XOR,
        # optimized/main.cu:575-618).
        j_up, j_dn, j_same, j_off = (r[...] for r in rest[:4])
        up = up ^ j_up
        dn = dn ^ j_dn
        same = same ^ j_same
        off = off ^ j_off

    tag = TAG_SWEEP | color
    family, rounds = parse_rng_mode(rng_mode)
    kplanes = plane_bits(rng_mode)

    if family == "hw" or kplanes:
        # Bit-serial acceptance: kbits random bit-planes compared against
        # STATIC k-bit thresholds (see _bitserial_lt_planes). Draw volume
        # drops from 32 to kbits bits/spin and the whole
        # compare/select/pack pipeline collapses to ~3 vector ops per
        # plane-word. hw mode uses it because it has no cross-backend bit
        # contract; the "...b" counter modes make the bit-plane consumption
        # the contract itself (rng.RNG_MODES), implemented identically by
        # the xla backend (xla_ref.sweep_color_planes).
        cols = kbits * W1
        if family in ("philox", "threefry", "chacha"):
            # The generator output words ARE the planes (chacha: word z =
            # plane z; philox/threefry: W1-lane slices) — handing them
            # over as a list skips the (BY, kbits*W1) concat that Mosaic
            # executes as real VMEM copies (PERF.md round 5).
            draws = _draw_plane_list(family, params_ref, W1, kbits, BY,
                                     seed, tag, blk=i, rounds=rounds,
                                     grows=grows)
        elif interp:
            draws = _philox_draw_block(params_ref, BY, cols, BY, seed,
                                       tag | 0x8000, blk=i)
        else:
            draws = _hw_draw_block(params_ref, BY, cols, seed, tag, blk=i)
        if tvals10 is not None:
            # External field: 10-class bit-serial accept (the generic
            # table covers T <= 0 too, so no greedy branch here).
            n0, n1, n2 = _neighbor_adder(up, dn, same, off)
            flip = _bitserial_field_flip(draws, me, n0, n1, n2, W1, kbits,
                                         tvals10, always10)
            out_ref[...] = me ^ flip
            return
        ge3, ge4, eq2 = _neighbor_class_masks(me, up, dn, same, off)
        lt4, lt8, coin = _bitserial_lt_planes(draws, W1, kbits, t4k, t8k)
        if greedy:
            flip = ((~ge3 & ~eq2) | (eq2 & coin)
                    | (ge3 & ~ge4 & lt4) | (ge4 & lt8))
        else:
            flip = (~ge3) | (ge3 & ~ge4 & lt4) | (ge4 & lt8)
        out_ref[...] = me ^ flip
        return

    # Counter modes: per-spin u32 draws, same contract and column order as
    # every other backend (draw column c of the (BY, C) block = compact
    # col c; the lane-group slice g*W1..(g+1)*W1 is bit-group g's columns).
    ge3, ge4, eq2 = _neighbor_class_masks(me, up, dn, same, off)
    if family == "philox":
        draws = _philox_draw_block(params_ref, BY, C, BY, seed, tag,
                                   blk=i, rounds=rounds, grows=grows)
    elif family == "chacha":
        draws = _chacha_draw_block(params_ref, BY, C, BY, seed, tag,
                                   blk=i, rounds=rounds, grows=grows)
    else:
        draws = _threefry_draw_block(params_ref, BY, C, BY, seed, tag,
                                     blk=i, rounds=rounds, grows=grows)

    bias = jnp.uint32(0x80000000)
    t4b = (thr_ref[8] ^ bias).astype(jnp.int32)
    t8b = (thr_ref[9] ^ bias).astype(jnp.int32)
    draws = (draws ^ bias).astype(jnp.int32)

    # Pack the compare results into bit planes: lane-group g weights 1<<g,
    # single OR tree (cmp8 implies cmp4, so both ride one weighted plane
    # with 2<<g — except 2<<31 overflows, so two planes it is).
    wv = jnp.concatenate(
        [jnp.full((1, W1), jnp.uint32(1 << g)) for g in range(SPW)], axis=1)
    cmp4 = draws <= t4b
    cmp8 = draws <= t8b
    P4 = jnp.where(cmp4, wv, jnp.uint32(0))
    P8 = jnp.where(cmp8, wv, jnp.uint32(0))
    P4w = P4[:, 0:W1]
    P8w = P8[:, 0:W1]
    for g in range(1, SPW):
        P4w = P4w | P4[:, g * W1:(g + 1) * W1]
        P8w = P8w | P8[:, g * W1:(g + 1) * W1]

    if greedy:
        # T <= 0 quench: the e == 2 class coin-flips on thr[7] instead of
        # always accepting (third compare + pack).
        t0b = (thr_ref[7] ^ bias).astype(jnp.int32)
        cmp0 = draws <= t0b
        P0 = jnp.where(cmp0, wv, jnp.uint32(0))
        P0w = P0[:, 0:W1]
        for g in range(1, SPW):
            P0w = P0w | P0[:, g * W1:(g + 1) * W1]
        flip = ((~ge3 & ~eq2) | (eq2 & P0w)
                | (ge3 & ~ge4 & P4w) | (ge4 & P8w))
    else:
        flip = (~ge3) | (ge3 & ~ge4 & P4w) | (ge4 & P8w)

    out_ref[...] = me ^ flip


@functools.partial(jax.jit, static_argnames=(
    "color", "seed", "rng_mode", "interpret", "greedy", "csl", "ysl",
    "split_links", "t4k", "t8k", "kbits", "grows", "tvals10", "always10"))
def bit1_sweep(dst, src, src_up, src_dn, thr10, row0, step, jplanes=None,
               *, color: int, seed: int, rng_mode: str = "threefry13",
               interpret: bool = False, greedy: bool = False,
               csl: int | None = None, ysl: int | None = None,
               split_links: bool = False,
               t4k: int = 0, t8k: int = 0, kbits: int = 24, grows: int = 0,
               tvals10: tuple | None = None, always10: int = 0):
    """One color half-sweep over the 1-bit (H, W1) plane.

    jplanes: optional disorder planes in the same (H, W1) word layout —
    either this color's (j_up, j_dn, j_same, j_off) projections, or, with
    split_links=True, the shared parity-split (vE, vO, hE, hO) link store
    from which the kernel derives the projections itself (single-device
    periodic wrap; 2 bits/site resident instead of 4+2). csl/ysl:
    sub-lattice replica geometry in compact columns / rows (csl must
    divide W1; the vertical wrap rides the block edge arrays like the
    packed tier). t4k/t8k/kbits are only consumed in hw / bit-plane
    modes: static k-bit acceptance thresholds for the bit-serial compare
    (ising.bernoulli_kbit_thresholds).
    """
    H, W1 = dst.shape
    fam, rounds = parse_rng_mode(rng_mode)
    if fam == "chacha" and plane_bits(rng_mode):
        # Measured on chip (PERF.md round 5, 16384^2 rounds x BY matrix):
        # the split-plane chacha kernels want LARGE blocks at few rounds
        # (r4 peaks at BY*W1 = 32768 words: 617 median vs 354 at the old
        # BY=16) and SMALL blocks at many rounds (r8's deeper unrolled
        # graph spills past BY*W1 = 4096: 134 at BY=128 vs 266 at 16).
        cap_words = (1 << 15) if rounds <= 4 else \
            ((1 << 13) if rounds <= 6 else (1 << 12))
        target = max(8, min(512, cap_words // max(1, W1)))
        from .pallas_dense import _pick_block_rows
        BY = _pick_block_rows(min(H, ysl) if ysl else H, target)
    else:
        if fam == "hw" or plane_bits(rng_mode):
            width = kbits * W1  # widest intermediate: the plane draw block
        elif fam in ("philox", "chacha"):
            # philox: ~7 live unrolled-round quad arrays of width 8*W1;
            # chacha: 16 live 2*W1-wide state arrays — the tight cap.
            width = 8 * W1
        else:
            width = 16 * W1
        # In replica mode the block height divides ysl, so vertical wrap
        # rows are always block-edge rows and ride the edge arrays below.
        BY = _block_rows_for(min(H, ysl) if ysl else H, width, rng_mode)
    nblk = H // BY

    if ysl:
        tops = np.arange(nblk) * BY
        top_src = np.where(tops % ysl != 0, tops - 1, tops + ysl - 1)
        bots = (np.arange(nblk) + 1) * BY - 1
        bot_src = np.where((bots + 1) % ysl != 0, bots + 1, bots - ysl + 1)
        ups = jnp.take(src, jnp.asarray(top_src), axis=0)
        dns = jnp.take(src, jnp.asarray(bot_src), axis=0)
    elif nblk > 1:
        ups = jnp.concatenate([src_up, src[BY - 1::BY][:-1]], axis=0)
        dns = jnp.concatenate([src[BY::BY], src_dn], axis=0)
    else:
        ups, dns = src_up, src_dn

    params = jnp.stack([
        row0 if hasattr(row0, "astype") else jnp.uint32(row0),
        step if hasattr(step, "astype") else jnp.uint32(step),
    ]).astype(jnp.uint32)

    blk = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    kernel = functools.partial(
        _bit1_kernel, color=color, row_block=BY, seed=seed,
        rng_mode=rng_mode, interp=interpret, greedy=greedy,
        disorder=jplanes is not None, split_links=split_links, csl=csl,
        t4k=t4k, t8k=t8k, kbits=kbits, grows=grows,
        tvals10=tvals10, always10=always10)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                     # params
        pl.BlockSpec(memory_space=pltpu.SMEM),                     # thr10
        pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM),      # dst
        pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM),      # src
        pl.BlockSpec((nblk, W1), whole, memory_space=pltpu.VMEM),  # ups
        pl.BlockSpec((nblk, W1), whole, memory_space=pltpu.VMEM),  # dns
    ]
    args = [params, thr10, dst, src, ups, dns]
    if jplanes is not None:
        in_specs += [pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM)
                     for _ in range(4)]
        args += list(jplanes)
        if split_links:
            # The in-kernel j_up derivation needs the v rows above each
            # block (periodic): edge arrays like ups/dns, for vE and vO.
            vE, vO = jplanes[0], jplanes[1]
            vupsE = jnp.concatenate([vE[-1:], vE[BY - 1::BY][:-1]], axis=0)
            vupsO = jnp.concatenate([vO[-1:], vO[BY - 1::BY][:-1]], axis=0)
            in_specs += [pl.BlockSpec((nblk, W1), whole,
                                      memory_space=pltpu.VMEM)
                         for _ in range(2)]
            args += [vupsE, vupsO]

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W1), jnp.uint32),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


class Bit1Backend:
    """Backend adapter: 1 bit per spin, bit-sliced sweep (speed tier)."""

    name = "bit1"
    bytes_per_spin = 0.125

    def __init__(self, cfg):
        self.csl = None
        self.ysl = None
        if cfg.xsl is not None:
            # Replica geometry constraints of the 1-bit layout (mirrors the
            # packed tier's divisibility fences and the reference's own
            # tile math, optimized/main.cu:1440-1453): csl = xsl/2 must
            # divide W1 = ncols/64 so the wrap never crosses a bit group,
            # and ysl must admit a block height (multiple of 8 rows).
            csl = cfg.xsl // 2
            W1 = cfg.ncols // (2 * SPW)
            if W1 % csl:
                raise ValueError(
                    f"bit1 replica mode needs xsl/2 ({csl}) to divide "
                    f"ncols/64 ({W1}); use xsl <= ncols/32 or the packed "
                    "backend (which admits xsl up to ncols/8)")
            if cfg.ysl % 8:
                raise ValueError("bit1 replica mode needs ysl % 8 == 0")
            self.csl = csl
            self.ysl = cfg.ysl
        self.cfg = cfg
        self.greedy = cfg.temperature <= 0
        self.interpret = jax.default_backend() == "cpu"
        # hw and "...b" bit-plane modes bake the k-bit acceptance thresholds
        # in as STATIC kernel params (the bit-serial compare unrolls on the
        # threshold's bits). The driver rebuilds the stepper when the
        # temperature changes.
        self.kplanes = plane_bits(cfg.rng)
        self.temp_static = (parse_rng_mode(cfg.rng)[0] == "hw"
                            or self.kplanes > 0)
        self.temperature = cfg.temperature
        # External field: the 10-class bit-serial accept (static per-class
        # k-bit thresholds, ising.field_kbit_thresholds). Config fences
        # field to the hw / bit-plane modes here, so temp_static always
        # holds when field != 0. The driver updates this attribute (and
        # rebuilds the stepper) on set_field.
        self.field = cfg.field
        # hw accept-path precision: flip probabilities realized on a 2^-k
        # grid. k = 24 matches the reference's curand_uniform granularity
        # (optimized/main.cu:652-656); the env knob is for perf experiments
        # only (k = 16's ~4e-6 absolute bias is detectable at bench scale).
        # The "...b" counter modes fix k = 16 in their contract instead.
        import os
        self.accept_bits = self.kplanes or int(
            os.environ.get("ISING_TPU_BIT1_KBITS", "24"))
        if not self.interpret and cfg.ncols % 8192:
            # W1 = ncols/64 must fill whole 128-lane registers on compiled
            # TPU (the same Mosaic sub-128-lane hazard the packed tier
            # fences with its ncols % 2048 constraint; see PERF.md).
            raise ValueError(
                "bit1 backend on TPU requires ncols % 8192 == 0; "
                "use the packed backend for smaller lattices")
        # Single-device unsharded runs can consume the parity-split link
        # store directly (in-kernel projection): 2 bits/site of resident
        # disorder instead of 4 (jb+jw) + 2 (links). Sharded/replica runs
        # keep the precomputed per-color planes (their vertical wrap
        # crosses slab/sub-lattice boundaries). The DRIVER flips
        # split_links on when it passes the link store as jplanes
        # (build_disorder); callers passing per-color projections leave it
        # False.
        self.split_links_capable = (cfg.ndev == 1 and cfg.xsl is None
                                    and cfg.ncols % 64 == 0)
        self.split_links = False

    def encode(self, black_bits, white_bits):
        return pack_bits1(black_bits), pack_bits1(white_bits)

    def decode(self, black_store, white_store):
        # Row-chunked at large heights: unpack's 32 shifted word planes
        # would otherwise transiently cost 32x the storage (OOM at the
        # reference's 131072x65536+ shapes, which fit this tier easily).
        Y = black_store.shape[0]
        chunk = 8192
        if Y <= chunk:
            return unpack_bits1(black_store), unpack_bits1(white_store)
        outs = ([], [])
        for r in range(0, Y, chunk):
            outs[0].append(unpack_bits1(black_store[r:r + chunk]))
            outs[1].append(unpack_bits1(white_store[r:r + chunk]))
            if not isinstance(outs[0][-1], jax.core.Tracer):
                # serialize chunk dispatch: async queuing would hold every
                # chunk's transients live at once and OOM (seen on hw)
                jax.block_until_ready((outs[0][-1], outs[1][-1]))
        return jnp.concatenate(outs[0]), jnp.concatenate(outs[1])

    def storage_pack_supported(self, black_store) -> bool:
        """Statically decidable gate for the checkpoint fast path (the
        driver checks this instead of probing with real device work)."""
        return black_store.shape[1] % 8 == 0

    def pack_storage_rows(self, black_store, white_store, r0: int, r1: int):
        """Checkpoint fast path: storage rows [r0, r1) as np.packbits-order
        byte planes, straight from the 1-bit words (no decode). Returns
        None when the geometry lacks the W1 % 8 alignment (caller falls
        back to the decode path)."""
        if black_store.shape[1] % 8:
            return None
        return (words_to_packed_rows(black_store[r0:r1]),
                words_to_packed_rows(white_store[r0:r1]))

    def encode_packed_rows(self, pb, pw):
        """Resume fast path: file byte planes -> storage words on device."""
        W1 = self.cfg.ncols // 64
        if W1 % 8:
            return None
        return packed_rows_to_words(pb, W1), packed_rows_to_words(pw, W1)

    def row_up_counts(self, black_store, white_store):
        """Popcount magnetization straight on the 1-bit words (jit-fused,
        row-chunked — see observables.word_row_up_counts)."""
        from ..observables import word_row_up_counts
        return word_row_up_counts(black_store, white_store)

    # Word-domain energy/correlation (observables.py): XOR + popcount on
    # the packed words, no decode — the full measurement pipeline runs at
    # shapes whose decoded byte planes would not fit (e.g. 524288x65536).
    def energy_rows(self, black_store, white_store):
        from .. import observables
        return observables.bit1_energy_row_sums(black_store, white_store)

    def energy_rows_disordered(self, black_store, white_store, links_words):
        """Disordered energy without decode: links_words is the driver's
        parity-split (vE, vO, hE, hO) packed link store."""
        from .. import observables
        return observables.bit1_energy_row_sums(black_store, white_store,
                                                links_words=links_words)

    def col_up_counts(self, black_store, white_store):
        """Per-column up counts straight on the 1-bit words (the column
        twin of row_up_counts; feeds analysis.kmin_mag2)."""
        from ..observables import bit1_col_up_counts
        return bit1_col_up_counts(black_store, white_store)

    def overlap_neq_rows(self, b1, w1, b2, w2):
        """Per-row differing-spin counts between two states' word storage
        (XOR + popcount; the Edwards-Anderson overlap's integer core)."""
        from ..observables import word_overlap_neq_rows
        return word_overlap_neq_rows(b1, w1, b2, w2)

    def corr_rows(self, black_store, white_store, corr_len):
        from .. import observables
        return observables.bit1_correlation_row_sums(
            black_store, white_store, corr_len)

    def encode_jplanes(self, planes):
        """(j_up, j_dn, j_same, j_off) uint8 planes -> bit1 word planes."""
        return tuple(pack_bits1(p) for p in planes)

    def update_color(self, dst, src, *, color, thr10, step, row0=0,
                     src_up=None, src_dn=None, jplanes=None):
        t4k = t8k = 0
        tvals10, always10 = None, 0
        if self.temp_static:
            from ..models import ising
            if self.field:
                tvals10, always10 = ising.field_kbit_thresholds(
                    self.temperature, self.field, self.accept_bits)
            else:
                t4k, t8k = ising.bernoulli_kbit_thresholds(
                    self.temperature, self.accept_bits)
        return bit1_sweep(dst, src, src_up, src_dn, thr10,
                          jnp.uint32(row0), step, jplanes, color=color,
                          seed=self.cfg.seed, rng_mode=self.cfg.rng,
                          interpret=self.interpret, greedy=self.greedy,
                          csl=self.csl, ysl=self.ysl,
                          split_links=self.split_links
                          and jplanes is not None,
                          t4k=t4k, t8k=t8k, kbits=self.accept_bits,
                          grows=self.cfg.nrows,
                          tvals10=tvals10, always10=always10)
