"""Pallas TPU kernel, packed tier (backend "packed") — the flagship.

TPU-native rebuild of the reference's optimized kernel
(spinUpdateV_2D_k, optimized/main.cu:463-670): 4 bits per spin packed into
words so the 4-neighbor sums of 8 spins happen as THREE whole-word adds
(each 4-bit field accumulates 0..4 without carry overflow — the reference's
trick at optimized/main.cu:623-635, on uint32 lanes instead of ulonglong2).

Packing layout (deliberately different from the reference's linear 16-per-
word layout, chosen for the TPU lane model): field z (bits 4z..4z+3) of
word j holds the spin at compact column z*W + j, where W = C/8. Columns of
one field group are contiguous lanes, so:

  * the off-column neighbor shift is a lane roll by 1 plus a single-lane
    fix-up at the group boundary (one select) — no cross-lane funnel shift
    per word (the TPU replacement for optimized/main.cu:541-573);
  * the per-field random-draw planes r_z are contiguous lane slices of the
    (BY, C) draw block — no lane interleaving anywhere.

Acceptance uses the mirrored neighbor count e = b ? n : 4-n, reducing the
reference's 2x5 exp table (optimized/main.cu:1683-1697) to three uint32
thresholds (e==2 -> thr[7] [only sub-unity at T<=0], e==3 -> thr[8],
e==4 -> thr[9]; e < 2 always accepts), computed word-wise with a masked
select — decisions are bit-identical to the table-lookup backends.

Quenched +-J disorder rides in one extra packed word per lattice word with
the four direction flags in bits 0..3 of each field (the analog of
optimized/main.cu:575-618), XORed into the neighbor words before the adds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLACK, WHITE
from ..rng import (TAG_SWEEP, key_from_seed, mulhilo32, parse_rng_mode, plane_bits,
                   philox4x32, threefry2x32, threefry_stream_key)
from .pallas_dense import _block_rows_for, unsigned_le

M1 = 0x11111111  # low bit of every 4-bit field


def pack_bits(bits):
    """(Y, C) uint8 bit plane -> (Y, W=C/8) uint32 packed words."""
    Y, C = bits.shape
    W = C // 8
    g = bits.reshape(Y, 8, W).astype(jnp.uint32)
    out = jnp.zeros((Y, W), jnp.uint32)
    for z in range(8):
        out = out | (g[:, z, :] << (4 * z))
    return out


def unpack_bits(packed):
    """(Y, W) uint32 packed words -> (Y, 8W) uint8 bit plane."""
    Y, W = packed.shape
    planes = [((packed >> (4 * z)) & 1).astype(jnp.uint8) for z in range(8)]
    return jnp.stack(planes, axis=1).reshape(Y, 8 * W)


def pack_jplanes(jplanes):
    """4 x (Y, C) uint8 direction-flag planes -> one (Y, W) uint32 word with
    flags in bits 0..3 of each field (order: up, dn, same, off)."""
    j_up, j_dn, j_same, j_off = jplanes
    return (pack_bits(j_up) | (pack_bits(j_dn) << 1)
            | (pack_bits(j_same) << 2) | (pack_bits(j_off) << 3))


def _draw_counters(params_ref, rows: int, nq: int, row_block: int, blk,
                   grows: int):
    """64-bit spatial counters (c0, c1) of one (rows, nq) draw block.

    The counter CONTRACT is the 64-bit quad index q64 = y * nq + q (see
    rng.quad_counters). When the caller proves the whole lattice's counter
    space fits 32 bits (grows = global rows, grows * nq < 2^32 — true for
    every lattice below ~2^32 counter blocks per color), the high word is
    identically zero, so it is emitted as a traced SCALAR instead of an
    array: c1, step and tag then enter the generators as 0-d values and
    early generator rounds constant-fold onto the scalar core (ChaCha's
    first column round runs 3 of its 4 quarter-rounds scalar). Measured
    effect (PERF.md round 5): within noise at the chacha tiers' small
    block heights, but it stabilizes the LARGE-block schedules the round-5
    BY retune selects (at BY*W1 >= 2^16 the 64-bit path collapsed ~2-3x:
    600 vs 197 flips/ns at BY=512), so it stays on. Counter VALUES —
    hence all trajectories — are bit-identical to the 64-bit path.
    """
    i = pl.program_id(0) if blk is None else blk
    row0 = params_ref[0] + (i * row_block).astype(jnp.uint32)
    y = jax.lax.broadcasted_iota(jnp.uint32, (rows, nq), 0) + row0
    q = jax.lax.broadcasted_iota(jnp.uint32, (rows, nq), 1)
    if grows and grows * nq < (1 << 32):
        return y * jnp.uint32(nq) + q, jnp.uint32(0)
    hi, lo = mulhilo32(y, jnp.uint32(nq))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    return c0, c1


def _philox_draw_block(params_ref, rows: int, cols: int, row_block: int,
                       seed: int, tag: int, blk=None, rounds: int = 10,
                       grows: int = 0):
    """(rows, cols) uint32 draws, identical contract to rng.color_draws."""
    c0, c1 = _draw_counters(params_ref, rows, cols // 4, row_block, blk,
                            grows)
    k0, k1 = key_from_seed(seed)
    o = philox4x32(c0, c1, params_ref[1], jnp.uint32(tag), k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def _threefry_draw_block(params_ref, rows: int, cols: int, row_block: int,
                         seed: int, tag: int, blk=None, rounds: int = 20,
                         grows: int = 0):
    """(rows, cols) uint32 draws per rng.threefry_color_draws' contract."""
    c0, c1 = _draw_counters(params_ref, rows, cols // 2, row_block, blk,
                            grows)
    k0, k1 = threefry_stream_key(seed, params_ref[1], tag)
    o0, o1 = threefry2x32(c0, c1, k0, k1, rounds)
    return jnp.concatenate([o0, o1], axis=-1)


def _chacha_draw_block(params_ref, rows: int, cols: int, row_block: int,
                       seed: int, tag: int, blk=None, rounds: int = 8,
                       grows: int = 0):
    """(rows, cols) uint32 draws per rng.chacha_color_draws' contract."""
    from ..rng import chacha_block
    c0, c1 = _draw_counters(params_ref, rows, cols // 16, row_block, blk,
                            grows)
    k0, k1 = key_from_seed(seed)
    o = chacha_block(c0, c1, params_ref[1], jnp.uint32(tag), k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def _draw_plane_list(family, params_ref, W1: int, kbits: int,
                     row_block: int, seed: int, tag: int, blk=None,
                     rounds: int = 0, grows: int = 0):
    """The kbits (BY, W1) bit-plane words of one draw block as a LIST,
    without materializing the (BY, kbits*W1) lane concat.

    Value contract: plane z == draws[:, z*W1:(z+1)*W1] of the
    corresponding _*_draw_block(cols=kbits*W1) call — the generators'
    output words are produced at exactly those lane offsets, so handing
    them over directly (chacha: plane z IS output word z when kbits == 16;
    philox/threefry: a W1-slice of output word z//4 / z//8) skips a
    concat -> re-slice round trip that Mosaic executes as real VMEM
    copies. Measured on chip (PERF.md round 5): the concat round trip
    plus the too-small block height hid ~1.8x of the chacha4b tier.
    """
    from ..rng import chacha_block
    c0, c1 = _draw_counters(params_ref, row_block, kbits * W1 // 16
                            if family == "chacha" else
                            (kbits * W1 // 4 if family == "philox"
                             else kbits * W1 // 2),
                            row_block, blk, grows)
    if family == "chacha":
        k0, k1 = key_from_seed(seed)
        o = chacha_block(c0, c1, params_ref[1], jnp.uint32(tag), k0, k1,
                         rounds)
        if kbits == 16:
            return list(o)
        full = jnp.concatenate(o, axis=-1)
        return [full[:, z * W1:(z + 1) * W1] for z in range(kbits)]
    if family == "philox":
        k0, k1 = key_from_seed(seed)
        o = philox4x32(c0, c1, params_ref[1], jnp.uint32(tag), k0, k1,
                       rounds)
        per = kbits * W1 // 4  # lanes per output word
        return [o[(z * W1) // per][:, (z * W1) % per:(z * W1) % per + W1]
                for z in range(kbits)]
    k0, k1 = threefry_stream_key(seed, params_ref[1], tag)
    o0, o1 = threefry2x32(c0, c1, k0, k1, rounds)
    o = (o0, o1)
    per = kbits * W1 // 2
    return [o[(z * W1) // per][:, (z * W1) % per:(z * W1) % per + W1]
            for z in range(kbits)]


def _hw_draw_block(params_ref, rows: int, cols: int, seed: int, tag: int,
                   blk=None):
    i = pl.program_id(0) if blk is None else blk
    s0 = jnp.uint32(seed & 0xFFFFFFFF) ^ (params_ref[1] * jnp.uint32(0x9E3779B9))
    s1 = (jnp.uint32(((seed >> 32) ^ tag) & 0xFFFFFFFF)
          + (params_ref[0] + i.astype(jnp.uint32)) * jnp.uint32(0x85EBCA6B))
    pltpu.prng_seed(s0, s1)
    return pltpu.bitcast(pltpu.prng_random_bits((rows, cols)), jnp.uint32)


def _metropolis_block(me, src, up_row, dn_row, params_ref, thr_ref, blk, *,
                      color: int, BY: int, W: int, seed: int, rng_mode: str,
                      interp: bool, greedy: bool, csl: int | None,
                      full_table: bool = False, grows: int = 0):
    """One (BY, W) packed block's Metropolis half-sweep -> updated words.

    `blk` is the global row-block index (traced), used for the RNG counters'
    row offset; `me` holds the dst color's words, `src` the opposite
    color's, with up_row/dn_row the (1, W) rows above/below the block.
    """
    up = jnp.concatenate([up_row, src[:-1]], axis=0)
    dn = jnp.concatenate([src[1:], dn_row], axis=0)

    # Off-column neighbor words. Column of field z, lane j is z*W + j.
    #   left  (col-1): lane j-1, same field; at j==0 wrap to lane W-1 with
    #                  fields shifted one group down (<<4 | >>28).
    #   right (col+1): lane j+1; at j==W-1 wrap to lane 0, fields one group
    #                  up (>>4 | <<28).
    # Sub-lattice replica mode (csl = XSL/2 compact columns, csl | W): the
    # wrap stays inside the field group, so both fixes become a second lane
    # roll selected at the sub-lattice boundary lanes (the TPU analog of the
    # reference's loadTile sub-lattice wrap, optimized/main.cu:413-458).
    lane = jax.lax.broadcasted_iota(jnp.int32, (BY, W), 1)
    if csl is None:
        wrapL = (src[:, W - 1:W] << 4) | (src[:, W - 1:W] >> 28)
        left = jnp.where(lane == 0, wrapL, pltpu.roll(src, 1, 1))
        wrapR = (src[:, 0:1] >> 4) | (src[:, 0:1] << 28)
        right = jnp.where(lane == W - 1, wrapR, pltpu.roll(src, W - 1, 1))
    else:
        left = jnp.where(lane % csl == 0,
                         pltpu.roll(src, (W - csl + 1) % W, 1),
                         pltpu.roll(src, 1, 1))
        right = jnp.where(lane % csl == csl - 1,
                          pltpu.roll(src, csl - 1, 1),
                          pltpu.roll(src, W - 1, 1))

    # Row parity selects the off-column side (black even rows look left;
    # basic_cuda/main.cu:73-79). Global parity == local parity (even blocks).
    odd = (jax.lax.broadcasted_iota(jnp.int32, (BY, W), 0) % 2) == 1
    same = src
    if color == BLACK:
        off = jnp.where(odd, right, left)
    else:
        off = jnp.where(odd, left, right)

    return _accept_and_flip(me, up, dn, same, off, params_ref, thr_ref, blk,
                            color=color, BY=BY, W=W, seed=seed,
                            rng_mode=rng_mode, interp=interp, greedy=greedy,
                            full_table=full_table, grows=grows)


def _accept_and_flip(me, up, dn, same, off, params_ref, thr_ref, blk, *,
                     color, BY, W, seed, rng_mode, interp, greedy,
                     full_table: bool = False, grows: int = 0):
    # Whole-word neighbor sum: every 4-bit field accumulates 0..4.
    nsum = up + dn + same + off

    # Mirrored count e = b ? n : 4 - n, word-wise: fields with b=1 keep n,
    # fields with b=0 take 4-n (0x44444444 - nsum has no borrows, n <= 4).
    m1 = me & M1
    mask = (m1 << 4) - m1          # 0xF where b=1, 0x0 where b=0
    e = (nsum & mask) | ((jnp.uint32(0x44444444) - nsum) & ~mask)

    tag = TAG_SWEEP | color
    t0 = thr_ref[7]   # e == 2 threshold (sub-unity only at T <= 0)
    t4 = thr_ref[8]   # e == 3: exp(-4/T)
    t8 = thr_ref[9]   # e == 4: exp(-8/T)

    # (A 16-bit two-spins-per-lane decision path was prototyped but v5e's
    # Mosaic target supports no 16-bit vector compares/shifts, so the
    # decision stays in 32-bit lanes.)
    family, rounds = parse_rng_mode(rng_mode)
    if family == "philox":
        draws = _philox_draw_block(params_ref, BY, 8 * W, BY, seed, tag,
                                   blk=blk, rounds=rounds, grows=grows)
    elif family == "threefry":
        draws = _threefry_draw_block(params_ref, BY, 8 * W, BY, seed, tag,
                                     blk=blk, rounds=rounds, grows=grows)
    elif family == "chacha":
        draws = _chacha_draw_block(params_ref, BY, 8 * W, BY, seed, tag,
                                   blk=blk, rounds=rounds, grows=grows)
    elif interp:
        # The CPU interpreter has no prng_seed; substitute a salted Philox
        # stream (hw mode carries no reproducibility contract anyway).
        draws = _philox_draw_block(params_ref, BY, 8 * W, BY, seed,
                                   tag | 0x8000, blk=blk)
    else:
        draws = _hw_draw_block(params_ref, BY, 8 * W, seed, tag, blk=blk)

    # SWAR class bits: one add+mask classifies all 8 fields at once
    # (e <= 4 so e + (8 - k) sets field bit 3 exactly when e >= k).
    M8 = jnp.uint32(0x88888888)
    ge3 = (e + jnp.uint32(0x55555555)) & M8
    ge4 = (e + jnp.uint32(0x44444444)) & M8

    # The unsigned compare runs in the signed domain (see unsigned_le):
    # bias the whole draw block once and pre-bias the scalar thresholds, so
    # the loop body pays only the compare.
    bias = jnp.uint32(0x80000000)
    tFb = jnp.int32(0x7FFFFFFF)              # 0xFFFFFFFF ^ bias: full accept
    t4b = (t4 ^ bias).astype(jnp.int32)
    t8b = (t8 ^ bias).astype(jnp.int32)
    if family == "hw" and not interp:
        # The hw generator's raw bits are uniform and XOR-by-constant is a
        # bijection on uniforms, so the raw bits can be read as
        # already-biased draws — the whole-plane bias XOR is free. Only
        # valid where no cross-backend bit contract fixes the draws.
        draws = draws.astype(jnp.int32)
    else:
        draws = (draws ^ bias).astype(jnp.int32)

    if full_table:
        # External-field path: h breaks the thr10[b*5+n]==thr10[(1-b)*5+
        # (4-n)] mirror symmetry, so every field selects among all 10
        # classes — the mirrored count e still classifies, and the own
        # bit picks between the two 5-entry chains (b=1: thr10[5+e];
        # b=0: n = 4-e, thr10[4-e]). The table already encodes the T <= 0
        # quench probabilities, so greedy needs no separate branch here.
        # Same biased signed-domain compare and per-field shift-to-sign
        # classification as the greedy path below (no new op shapes for
        # Mosaic; gated compiled by verify_tpu --backend packed).
        ge1 = (e + jnp.uint32(0x77777777)) & M8
        ge2 = (e + jnp.uint32(0x66666666)) & M8
        tb = [(thr_ref[k] ^ bias).astype(jnp.int32) for k in range(10)]
        flip = jnp.zeros((BY, W), jnp.uint32)
        for z in range(8):
            sh = 28 - 4 * z
            is4 = (ge4 << sh).astype(jnp.int32) < 0
            is3 = (ge3 << sh).astype(jnp.int32) < 0
            is2 = (ge2 << sh).astype(jnp.int32) < 0
            is1 = (ge1 << sh).astype(jnp.int32) < 0
            own = (me << (31 - 4 * z)).astype(jnp.int32) < 0
            t_up = jnp.where(is4, tb[9], jnp.where(is3, tb[8],
                             jnp.where(is2, tb[7], jnp.where(is1, tb[6],
                                                             tb[5]))))
            t_dn = jnp.where(is4, tb[0], jnp.where(is3, tb[1],
                             jnp.where(is2, tb[2], jnp.where(is1, tb[3],
                                                             tb[4]))))
            tsel = jnp.where(own, t_up, t_dn)
            acc = draws[:, z * W:(z + 1) * W] <= tsel
            flip = flip | jnp.where(acc, jnp.uint32(1 << (4 * z)),
                                    jnp.uint32(0))
        return me ^ flip

    if not greedy:
        # T > 0 plane-wise path: two whole-plane compares + word-mask
        # assembly.
        #   g3/g4: field low-bit = (e >= 3) / (e >= 4)
        #   Both compare results pack through ONE weight-plane select pass:
        #     field value of P = cmp4 + 2*cmp8 in {0,1,3} (cmp8 implies
        #     cmp4 since thr8 <= thr4), reduced over the 8 lane groups with
        #     a single OR tree instead of two.
        #   flip = always-accept (e < 3) | class-3 & cmp4 | class-4 & cmp8.
        g3 = (ge3 >> 3) & jnp.uint32(M1)
        g4 = (ge4 >> 3) & jnp.uint32(M1)
        # Built from scalar fills (pallas kernels cannot capture array
        # constants): lane z*W+j carries weight 1 << 4z (and 2 << 4z).
        wvec = jnp.concatenate(
            [jnp.full((1, W), jnp.uint32(1 << (4 * z))) for z in range(8)],
            axis=1)
        wvec2 = jnp.concatenate(
            [jnp.full((1, W), jnp.uint32(2 << (4 * z))) for z in range(8)],
            axis=1)
        cmp4 = draws <= t4b
        cmp8 = draws <= t8b
        P = (jnp.where(cmp4, wvec, jnp.uint32(0))
             | jnp.where(cmp8, wvec2, jnp.uint32(0)))
        Pw = P[:, 0:W]
        for z in range(1, 8):
            Pw = Pw | P[:, z * W:(z + 1) * W]
        M1w = jnp.uint32(M1)
        P4w = Pw & M1w
        P8w = (Pw >> 1) & M1w
        flip = ((M1w & ~g3) | (g3 & ~g4 & P4w) | (g4 & P8w))
        return me ^ flip

    # greedy = T <= 0 quench semantics: the e == 2 class coin-flips on t0
    # instead of always accepting, needing a third select.
    if greedy:
        ge2 = (e + jnp.uint32(0x66666666)) & M8
        t0b = (t0 ^ bias).astype(jnp.int32)

    # tFULL guarantees acceptance for e < 2 even at T <= 0 (t0 < max).
    flip = jnp.zeros((BY, W), jnp.uint32)
    for z in range(8):
        # Shift the field's class bit to the sign position: one shift +
        # one signed compare per class, no multiplies.
        is4 = (ge4 << (28 - 4 * z)).astype(jnp.int32) < 0
        is3 = (ge3 << (28 - 4 * z)).astype(jnp.int32) < 0
        if greedy:
            lt2 = (ge2 << (28 - 4 * z)).astype(jnp.int32) >= 0
            tsel = jnp.where(lt2, tFb,
                             jnp.where(is4, t8b, jnp.where(is3, t4b, t0b)))
        else:
            # T > 0: every e <= 2 class accepts unconditionally.
            tsel = jnp.where(is4, t8b, jnp.where(is3, t4b, tFb))
        acc = draws[:, z * W:(z + 1) * W] <= tsel
        # Select the pre-shifted constant rather than convert-then-shift:
        # Mosaic mis-executes (bool -> u32) << k on sub-128-lane shapes.
        flip = flip | jnp.where(acc, jnp.uint32(1 << (4 * z)), jnp.uint32(0))

    return me ^ flip


def _packed_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                   *rest, color: int, row_block: int, seed: int,
                   rng_mode: str, disorder: bool, csl: int | None = None,
                   interp: bool = False, greedy: bool = False,
                   full_table: bool = False, grows: int = 0):
    out_ref = rest[-1]
    BY = row_block
    W = dst_ref.shape[1]
    i = pl.program_id(0)

    me = dst_ref[...]
    src = src_ref[...]
    up_row = up_ref[pl.ds(i, 1), :]
    dn_row = dn_ref[pl.ds(i, 1), :]

    if disorder:
        # J flags XOR into the neighbor words before the sums; routed here
        # (not in _metropolis_block) so the neighbor construction stays
        # shared. Fields: bit0=up, 1=dn, 2=same, 3=off.
        up = jnp.concatenate([up_row, src[:-1]], axis=0)
        dn = jnp.concatenate([src[1:], dn_row], axis=0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (BY, W), 1)
        if csl is None:
            wrapL = (src[:, W - 1:W] << 4) | (src[:, W - 1:W] >> 28)
            left = jnp.where(lane == 0, wrapL, pltpu.roll(src, 1, 1))
            wrapR = (src[:, 0:1] >> 4) | (src[:, 0:1] << 28)
            right = jnp.where(lane == W - 1, wrapR,
                              pltpu.roll(src, W - 1, 1))
        else:
            left = jnp.where(lane % csl == 0,
                             pltpu.roll(src, (W - csl + 1) % W, 1),
                             pltpu.roll(src, 1, 1))
            right = jnp.where(lane % csl == csl - 1,
                              pltpu.roll(src, csl - 1, 1),
                              pltpu.roll(src, W - 1, 1))
        odd = (jax.lax.broadcasted_iota(jnp.int32, (BY, W), 0) % 2) == 1
        same = src
        if color == BLACK:
            off = jnp.where(odd, right, left)
        else:
            off = jnp.where(odd, left, right)
        jw = rest[0][...]
        up = up ^ (jw & M1)
        dn = dn ^ ((jw >> 1) & M1)
        same = same ^ ((jw >> 2) & M1)
        off = off ^ ((jw >> 3) & M1)
        out_ref[...] = _accept_and_flip(
            me, up, dn, same, off, params_ref, thr_ref, i, color=color,
            BY=BY, W=W, seed=seed, rng_mode=rng_mode, interp=interp,
            greedy=greedy, full_table=full_table, grows=grows)
    else:
        out_ref[...] = _metropolis_block(
            me, src, up_row, dn_row, params_ref, thr_ref, i, color=color,
            BY=BY, W=W, seed=seed, rng_mode=rng_mode, interp=interp,
            greedy=greedy, csl=csl, full_table=full_table, grows=grows)


def _fused_kernel(params_ref, thr_ref, bin_ref, wsrc_ref,
                  wup_ref, wdn_ref, bout_ref, wout_ref,
                  prev_black, first_black, prev_white, first_white,
                  rowb1, prev_last,
                  *, row_block: int, nblk: int, seed: int, rng_mode: str,
                  interp: bool, greedy: bool, full_table: bool = False):
    """Both color phases of one MC step in a single kernel (ndev == 1).

    Software pipeline with a one-block lag: grid step i computes black'
    block i (for i < nblk) and white' block k, where k = i-1 for
    2 <= i <= nblk-1, k = nblk-1 at i = nblk, and k = 0 at i = nblk+1
    (the last two carry the periodic dependency on late black blocks).
    White reads its own old bits and the black rows it needs from VMEM
    scratch, so per-step HBM traffic drops from 6 planes to 4
    (read B, read W once, write B', write W').
    """
    BY = row_block
    nb = nblk
    W = bin_ref.shape[1]
    i = pl.program_id(0)

    # ---- black phase: black' for block min(i, nb-1) (garbage at i >= nb,
    # never stored or consumed there).
    bi = jnp.minimum(i, nb - 1)
    me_b = bin_ref[...]
    src_w = wsrc_ref[...]
    up_row = wup_ref[pl.ds(bi, 1), :]
    dn_row = wdn_ref[pl.ds(bi, 1), :]
    newb = _metropolis_block(me_b, src_w, up_row, dn_row, params_ref,
                             thr_ref, bi, color=BLACK, BY=BY, W=W, seed=seed,
                             rng_mode=rng_mode, interp=interp, greedy=greedy,
                             csl=None, full_table=full_table)

    @pl.when(i < nb)
    def _():
        bout_ref[...] = newb

    # Snapshot scratches BEFORE this step's updates.
    old_prev_black = prev_black[...]
    old_prev_last = prev_last[...]
    old_prev_white = prev_white[...]

    # ---- white phase for block k.
    k = jnp.where(i <= nb - 1, i - 1,
                  jnp.where(i == nb, nb - 1, 0)).astype(jnp.int32)
    last_step = i == nb + 1
    me_w = jnp.where(last_step, first_white[...], old_prev_white)
    body = jnp.where(last_step, first_black[...], old_prev_black)
    top = jnp.where(last_step, old_prev_black[BY - 1:BY, :], old_prev_last)
    bottom = jnp.where(i <= nb - 1, newb[0:1, :],
                       jnp.where(i == nb, first_black[0:1, :],
                                 rowb1[...]))
    neww = _metropolis_block(me_w, body, top, bottom, params_ref, thr_ref,
                             k, color=WHITE, BY=BY, W=W, seed=seed,
                             rng_mode=rng_mode, interp=interp, greedy=greedy,
                             csl=None, full_table=full_table)

    @pl.when(i >= 2)
    def _():
        wout_ref[...] = neww

    # ---- scratch updates (only while black blocks are produced).
    @pl.when(i < nb)
    def _():
        prev_last[...] = old_prev_black[BY - 1:BY, :]
        prev_black[...] = newb
        prev_white[...] = src_w

        @pl.when(i == 0)
        def _():
            first_black[...] = newb
            first_white[...] = src_w

        @pl.when(i == 1)
        def _():
            rowb1[...] = newb[0:1, :]


def _fused_manual_kernel(params_ref, thr_ref, bin_hbm, win_hbm,
                         wup_ref, wdn_ref, bout_hbm, wout_hbm,
                         bbuf, wbuf, nbring, wobuf,
                         first_black, first_white, row_b1, last_bm1,
                         bin_sem, win_sem, bout_sem, wout_sem,
                         *, row_block: int, nblk: int, seed: int,
                         rng_mode: str, interp: bool, greedy: bool,
                         full_table: bool = False):
    """Both color phases of one MC step, explicitly software-pipelined.

    Round-1's fused kernel used BlockSpec windows plus cross-grid-step VMEM
    scratch; the scratch dependencies serialized Mosaic's automatic pipeline
    (233 vs ~400 flips/ns). This version owns the pipeline: lattice planes
    stay in HBM (ANY memory space) and every block moves by explicit
    double-buffered async DMA, so the step-i+1 input DMAs overlap step-i
    compute by construction while HBM traffic stays at 4 planes/step
    (read B, read W, write B', write W').

    Schedule (grid step i): prefetch black/white blocks i+1; compute
    black' i (i < nblk) from old-black me + old-white stencil; compute
    white' k, k = i-1 for 1 <= i <= nblk-1, k = nblk-1 at i = nblk and
    k = 0 at i = nblk+1 (the last two carry the periodic wrap via small
    persistent row buffers, same dataflow as the verified v1 schedule).

    VMEM rings: bbuf(2) old-black in, wbuf(3) old-white in (white phase k
    reuses slot k as its own-color me one step later), nbring(3) new-black
    blocks (white reads its neighbor rows from VMEM — never re-read from
    HBM), wobuf(2) white' staging for DMA-out.
    """
    BY = row_block
    nb = nblk
    W = bbuf.shape[2]
    i = pl.program_id(0)

    def bin_dma(blk, slot):
        return pltpu.make_async_copy(
            bin_hbm.at[pl.ds(blk * BY, BY), :], bbuf.at[slot],
            bin_sem.at[slot])

    def win_dma(blk, slot):
        return pltpu.make_async_copy(
            win_hbm.at[pl.ds(blk * BY, BY), :], wbuf.at[slot],
            win_sem.at[slot])

    def bout_dma(blk, slot):
        return pltpu.make_async_copy(
            nbring.at[slot], bout_hbm.at[pl.ds(blk * BY, BY), :],
            bout_sem.at[slot])

    def wout_dma(blk, slot):
        return pltpu.make_async_copy(
            wobuf.at[slot], wout_hbm.at[pl.ds(blk * BY, BY), :],
            wout_sem.at[slot])

    # ---- prefetch: warm up at i == 0, then stay one block ahead.
    @pl.when(i == 0)
    def _():
        bin_dma(0, 0).start()
        win_dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        bin_dma(i + 1, (i + 1) % 2).start()
        win_dma(i + 1, (i + 1) % 3).start()

    # ---- black phase: black' block i.
    @pl.when(i < nb)
    def _():
        # Reusing nbring slot i%3 requires its DMA-out (started at i-3) to
        # have drained.
        @pl.when(i >= 3)
        def _():
            bout_dma(i - 3, i % 3).wait()
        bin_dma(i, i % 2).wait()
        win_dma(i, i % 3).wait()
        me_b = bbuf[i % 2]
        src_w = wbuf[i % 3]
        up_row = wup_ref[pl.ds(i, 1), :]
        dn_row = wdn_ref[pl.ds(i, 1), :]
        newb = _metropolis_block(
            me_b, src_w, up_row, dn_row, params_ref, thr_ref, i,
            color=BLACK, BY=BY, W=W, seed=seed, rng_mode=rng_mode,
            interp=interp, greedy=greedy, csl=None,
            full_table=full_table)
        nbring[i % 3] = newb
        bout_dma(i, i % 3).start()

        @pl.when(i == 0)
        def _():
            first_black[...] = newb
            first_white[...] = src_w

        @pl.when(i == 1)
        def _():
            row_b1[...] = newb[0:1, :]

        @pl.when(i == nb - 1)
        def _():
            last_bm1[...] = newb[BY - 1:BY, :]

    # ---- white phase: white' block k. Processing order 1..nb-2 (at grid
    # steps 2..nb-1), then nb-1 (step nb), then 0 (step nb+1): the last two
    # carry the periodic dependency on late black blocks. Split into two
    # pl.when branches (only the taken branch executes on TPU) so the
    # steady-state path pays no whole-block selects or untaken-path loads —
    # a single whole-block select measured ~µs/step, enough to break the
    # DMA/compute overlap budget.
    # Staging slot i % 2 was last used at step i - 2 for block i - 3.
    @pl.when(jnp.logical_and(i >= 4, i <= nb + 1))
    def _():
        wout_dma(i - 3, i % 2).wait()

    @pl.when(jnp.logical_and(i >= 2, i <= nb))
    def _():
        k = jnp.minimum(i - 1, nb - 1)
        me_w = wbuf[k % 3]
        # Opposite color = NEW black: body block k, top row from block k-1's
        # last row, bottom row from block k+1's first row (all in VMEM).
        body = nbring[k % 3]
        top = nbring[(k - 1) % 3][BY - 1:BY, :]
        bottom = jnp.where(i == nb, first_black[0:1, :],
                           nbring[i % 3][0:1, :])
        neww = _metropolis_block(
            me_w, body, top, bottom, params_ref, thr_ref, k, color=WHITE,
            BY=BY, W=W, seed=seed, rng_mode=rng_mode, interp=interp,
            greedy=greedy, csl=None, full_table=full_table)
        wobuf[i % 2] = neww
        wout_dma(k, i % 2).start()

    @pl.when(i == nb + 1)
    def _():
        # White block 0 last: periodic dependencies on the saved buffers.
        neww = _metropolis_block(
            first_white[...], first_black[...], last_bm1[...], row_b1[...],
            params_ref, thr_ref, jnp.int32(0), color=WHITE, BY=BY, W=W,
            seed=seed, rng_mode=rng_mode, interp=interp, greedy=greedy,
            csl=None, full_table=full_table)
        wobuf[i % 2] = neww
        wout_dma(0, i % 2).start()

    # ---- drain all outstanding DMA-outs on the last step.
    @pl.when(i == nb + 1)
    def _():
        # Black blocks whose reuse-wait (at grid step blk + 3, only fired
        # while blk + 3 <= nb - 1) never ran: the last min(3, nb) blocks.
        for blk in range(max(0, nb - 3), nb):
            bout_dma(blk, blk % 3).wait()
        # White: steps nb (block nb-1, slot nb%2) and nb+1 (block 0,
        # slot (nb+1)%2) are still in flight; earlier ones were drained by
        # the i >= 4 reuse-waits.
        wout_dma(nb - 1, nb % 2).wait()
        wout_dma(0, (nb + 1) % 2).wait()


@functools.partial(jax.jit, static_argnames=(
    "seed", "rng_mode", "interpret", "greedy", "block_rows",
    "full_table"))
def packed_fused_step_manual(black, white, thr10, row0, step, *, seed: int,
                             rng_mode: str = "philox",
                             interpret: bool = False, greedy: bool = False,
                             block_rows: int | None = None,
                             full_table: bool = False):
    """One full MC step (both colors), manually pipelined (see kernel)."""
    H, W = black.shape
    BY = block_rows or _block_rows_for(H, 4 * W, rng_mode)
    nblk = H // BY
    if nblk < 3:
        raise ValueError("fused step needs at least 3 row blocks")

    # Old-white halo rows for the black phase (periodic, single device).
    ups = jnp.concatenate([white[-1:], white[BY - 1::BY][:-1]], axis=0)
    dns = jnp.concatenate([white[BY::BY], white[:1]], axis=0)

    params = jnp.stack([
        row0 if hasattr(row0, "astype") else jnp.uint32(row0),
        step if hasattr(step, "astype") else jnp.uint32(step),
    ]).astype(jnp.uint32)

    whole = lambda i: (0, 0)
    kernel = functools.partial(
        _fused_manual_kernel, row_block=BY, nblk=nblk, seed=seed,
        rng_mode=rng_mode, interp=interpret, greedy=greedy,
        full_table=full_table)

    new_black, new_white = pl.pallas_call(
        kernel,
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # params
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # thr10
            pl.BlockSpec(memory_space=pl.ANY),                        # black
            pl.BlockSpec(memory_space=pl.ANY),                        # white
            pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),  # ups
            pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),  # dns
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)],
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32),
                   jax.ShapeDtypeStruct((H, W), jnp.uint32)],
        scratch_shapes=[
            pltpu.VMEM((2, BY, W), jnp.uint32),   # bbuf (old black in)
            pltpu.VMEM((3, BY, W), jnp.uint32),   # wbuf (old white in)
            pltpu.VMEM((3, BY, W), jnp.uint32),   # nbring (new black)
            pltpu.VMEM((2, BY, W), jnp.uint32),   # wobuf (white' staging)
            pltpu.VMEM((BY, W), jnp.uint32),      # first_black
            pltpu.VMEM((BY, W), jnp.uint32),      # first_white
            pltpu.VMEM((1, W), jnp.uint32),       # row_b1
            pltpu.VMEM((1, W), jnp.uint32),       # last_bm1
            pltpu.SemaphoreType.DMA((2,)),        # bin_sem
            pltpu.SemaphoreType.DMA((3,)),        # win_sem
            pltpu.SemaphoreType.DMA((3,)),        # bout_sem
            pltpu.SemaphoreType.DMA((2,)),        # wout_sem
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, thr10, black, white, ups, dns)
    return new_black, new_white


@functools.partial(jax.jit, static_argnames=(
    "seed", "rng_mode", "interpret", "greedy", "full_table"))
def packed_fused_step(black, white, thr10, row0, step, *, seed: int,
                      rng_mode: str = "philox", interpret: bool = False,
                      greedy: bool = False, full_table: bool = False):
    """One full MC step (both colors) in a single fused pallas_call."""
    H, W = black.shape
    BY = _block_rows_for(H, 4 * W, rng_mode)
    nblk = H // BY
    if nblk < 3:
        raise ValueError("fused step needs at least 3 row blocks")

    # Old-white halo rows for the black phase (periodic, single device).
    ups = jnp.concatenate([white[-1:], white[BY - 1::BY][:-1]], axis=0)
    dns = jnp.concatenate([white[BY::BY], white[:1]], axis=0)

    params = jnp.stack([
        row0 if hasattr(row0, "astype") else jnp.uint32(row0),
        step if hasattr(step, "astype") else jnp.uint32(step),
    ]).astype(jnp.uint32)

    blk_b = lambda i: (jnp.minimum(i, nblk - 1), 0)
    blk_w = lambda i: (jnp.where(i <= 2, 1,
                                 jnp.where(i <= nblk - 1, i - 1,
                                           jnp.where(i == nblk, nblk - 1,
                                                     0))), 0)
    whole = lambda i: (0, 0)

    kernel = functools.partial(
        _fused_kernel, row_block=BY, nblk=nblk, seed=seed,
        rng_mode=rng_mode, interp=interpret, greedy=greedy,
        full_table=full_table)

    new_black, new_white = pl.pallas_call(
        kernel,
        grid=(nblk + 2,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # params
            pl.BlockSpec(memory_space=pltpu.SMEM),                     # thr10
            pl.BlockSpec((BY, W), blk_b, memory_space=pltpu.VMEM),     # black
            pl.BlockSpec((BY, W), blk_b, memory_space=pltpu.VMEM),     # white
            pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),   # ups
            pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),   # dns
        ],
        out_specs=[
            pl.BlockSpec((BY, W), blk_b, memory_space=pltpu.VMEM),
            pl.BlockSpec((BY, W), blk_w, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32),
                   jax.ShapeDtypeStruct((H, W), jnp.uint32)],
        scratch_shapes=[
            pltpu.VMEM((BY, W), jnp.uint32),   # prev_black
            pltpu.VMEM((BY, W), jnp.uint32),   # first_black
            pltpu.VMEM((BY, W), jnp.uint32),   # prev_white
            pltpu.VMEM((BY, W), jnp.uint32),   # first_white
            pltpu.VMEM((1, W), jnp.uint32),    # rowb1
            pltpu.VMEM((1, W), jnp.uint32),    # prev_last
        ],
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, thr10, black, white, ups, dns)
    return new_black, new_white


@functools.partial(jax.jit, static_argnames=(
    "color", "seed", "rng_mode", "interpret", "csl", "ysl", "greedy",
    "full_table", "grows"))
def packed_sweep(dst, src, src_up, src_dn, thr10, row0, step, jword=None,
                 *, color: int, seed: int, rng_mode: str = "philox",
                 interpret: bool = False, csl: int | None = None,
                 ysl: int | None = None, greedy: bool = False,
                 full_table: bool = False, grows: int = 0):
    """One color half-sweep over the packed (H, W) plane."""
    import numpy as np

    H, W = dst.shape
    # In replica mode the block height divides ysl, so vertical wrap targets
    # are always block-edge rows and ride the edge arrays below. Width cap:
    # the draws block is (BY, 8W) u32 in hw mode / quad arrays in philox.
    BY = _block_rows_for(min(H, ysl) if ysl else H,
                         2 * W if parse_rng_mode(rng_mode)[0] == "philox"
                         else 4 * W, rng_mode)
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

    disorder = jword is not None
    blk = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # params
        pl.BlockSpec(memory_space=pltpu.SMEM),                    # thr10
        pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM),      # dst
        pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM),      # src
        pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),  # up edges
        pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),  # dn edges
    ]
    args = [params, thr10, dst, src, ups, dns]
    if disorder:
        specs.append(pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM))
        args.append(jword)

    kernel = functools.partial(
        _packed_kernel, color=color, row_block=BY, seed=seed,
        rng_mode=rng_mode, disorder=disorder, csl=csl, interp=interpret,
        greedy=greedy, full_table=full_table, grows=grows)

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=specs,
        out_specs=pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint32),
        input_output_aliases={2: 0},
        interpret=interpret,
        # v5e has 128 MB of physical VMEM; the default 16 MB scoped limit
        # rejects the large-block schedules that measure fastest (BY=512
        # needs ~50 MB for the draw and compare planes).
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)


class PackedBackend:
    """Backend adapter: 4-bit packed uint32 storage, word-parallel sweep."""

    name = "packed"
    bytes_per_spin = 0.5

    def __init__(self, cfg):
        self.csl = None
        self.ysl = None
        if plane_bits(cfg.rng):
            raise NotImplementedError(
                "bit-plane rng modes (...b) are implemented by the bit1 and "
                "xla backends (their storage matches the plane layout); use "
                "philox7/threefry13 here")
        if cfg.xsl is not None:
            # Replica geometry constraints of the packed layout (the
            # reference imposes analogous tile-math divisibility,
            # optimized/main.cu:1440-1453): the compact sub-lattice width
            # must divide the word-group width, and ysl must be a multiple
            # of 8 rows so a block height dividing it exists.
            csl = cfg.xsl // 2
            W = cfg.ncols // 16
            if W % csl:
                raise ValueError(
                    f"packed replica mode needs xsl/2 ({csl}) to divide "
                    f"ncols/16 ({W}); use xsl <= ncols/8 or the xla backend")
            if cfg.ysl % 8:
                raise ValueError("packed replica mode needs ysl % 8 == 0")
            self.csl = csl
            self.ysl = cfg.ysl
        self.cfg = cfg
        # Static accept-path variant: T <= 0 quench needs the extra e == 2
        # coin-flip class. The driver flips this attribute (triggering a
        # retrace) if set_temperature ever crosses zero.
        self.greedy = cfg.temperature <= 0
        # External field: the mirror symmetry is gone; every field
        # selects among all 10 classes (see _accept_and_flip).
        self.full_table = cfg.field != 0.0
        self.interpret = jax.default_backend() == "cpu"
        if not self.interpret and cfg.ncols % 2048:
            # On compiled TPU the packed plane width W = ncols/16 must fill
            # whole 128-lane registers: Mosaic was observed to mis-execute
            # one field's accept-bit accumulation on sub-128-lane shapes
            # (silent wrong results — verified against the CPU ground truth;
            # see PERF.md). The reference's optimized kernel imposes the
            # identical constraint for its own tile math
            # (optimized/main.cu:1412: X must be a multiple of 2048).
            raise ValueError(
                "packed backend on TPU requires ncols % 2048 == 0; "
                "use the dense or xla backend for smaller lattices")

    def encode(self, black_bits, white_bits):
        return pack_bits(black_bits), pack_bits(white_bits)

    def decode(self, black_store, white_store):
        # Row-chunked at large heights (see Bit1Backend.decode).
        Y = black_store.shape[0]
        chunk = 8192
        if Y <= chunk:
            return unpack_bits(black_store), unpack_bits(white_store)
        outs = ([], [])
        for r in range(0, Y, chunk):
            outs[0].append(unpack_bits(black_store[r:r + chunk]))
            outs[1].append(unpack_bits(white_store[r:r + chunk]))
            if not isinstance(outs[0][-1], jax.core.Tracer):
                # serialize chunk dispatch: async queuing would hold every
                # chunk's transients live at once and OOM (seen on hw)
                jax.block_until_ready((outs[0][-1], outs[1][-1]))
        return jnp.concatenate(outs[0]), jnp.concatenate(outs[1])

    def fusable(self, nrows: int) -> bool:
        """Whether the fused both-colors step applies (single device, no
        replica/disorder modes, enough row blocks to pipeline).

        DECIDED (round 2, PERF.md "Fused two-phase packed kernel"): the
        TWO-CALL path ships as the default. Both fused variants were built,
        verified bit-exact, and measured SLOWER on v5e — v1 (BlockSpec
        windows + VMEM scratch) serializes Mosaic's pipeline (~40% slower
        at 16384^2); v2 (explicit double-buffered DMA, planes in ANY/HBM)
        tops out at ~340 GB/s vs the auto-pipelined two-call path's
        645 GB/s. They remain behind ISING_TPU_FUSED=1|2 purely as
        documented, reproducible ablations (scripts/bench_fused.py,
        scripts/experiments/); nothing selects them by default.
        """
        import os
        mode = os.environ.get("ISING_TPU_FUSED")
        if mode not in ("1", "2"):
            return False
        if self.cfg.ndev != 1 or self.cfg.xsl is not None \
                or self.cfg.j_prob is not None:
            return False
        BY = self.fused_block_rows(nrows)
        return nrows // BY >= 3

    def fused_block_rows(self, nrows: int) -> int:
        import os
        by = os.environ.get("ISING_TPU_FUSED_BY")
        return int(by) if by else _block_rows_for(
            nrows, 4 * (self.cfg.ncols // 16), self.cfg.rng)

    def update_step(self, black, white, *, thr10, step):
        """Fused both-colors MC step (4-plane HBM traffic instead of 6)."""
        import os
        if os.environ.get("ISING_TPU_FUSED") == "2":
            return packed_fused_step_manual(
                black, white, thr10, jnp.uint32(0), step,
                seed=self.cfg.seed, rng_mode=self.cfg.rng,
                interpret=self.interpret, greedy=self.greedy,
                block_rows=self.fused_block_rows(black.shape[0]),
                full_table=self.full_table)
        return packed_fused_step(black, white, thr10, jnp.uint32(0), step,
                                 seed=self.cfg.seed, rng_mode=self.cfg.rng,
                                 interpret=self.interpret,
                                 greedy=self.greedy,
                                 full_table=self.full_table)

    def row_up_counts(self, black_store, white_store):
        """Popcount on packed words (reference getMagn_k analog) — no decode."""
        from ..observables import packed_row_up_counts
        return packed_row_up_counts(black_store, white_store)

    def overlap_neq_rows(self, b1, w1, b2, w2):
        """Per-row differing-spin counts between two states' packed words
        (XOR masked to the nibble spin bits, like packed_row_up_counts)."""
        from ..observables import word_overlap_neq_rows
        return word_overlap_neq_rows(b1, w1, b2, w2, field_mask=0x11111111)

    def encode_jplanes(self, jplanes):
        # One packed word replaces the four bit planes (tuple of len 1 so the
        # driver/stepper can thread it like the dense backend's 4-tuple).
        return (pack_jplanes(jplanes),)

    def update_color(self, dst, src, *, color, thr10, step, row0=0,
                     src_up=None, src_dn=None, jplanes=None):
        jword = jplanes[0] if jplanes is not None else None
        return packed_sweep(dst, src, src_up, src_dn, thr10,
                            jnp.uint32(row0), step, jword,
                            color=color, seed=self.cfg.seed,
                            rng_mode=self.cfg.rng, interpret=self.interpret,
                            csl=self.csl, ysl=self.ysl, greedy=self.greedy,
                            full_table=self.full_table,
                            grows=self.cfg.nrows)
