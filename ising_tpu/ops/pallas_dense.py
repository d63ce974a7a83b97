"""Pallas TPU kernel, dense tier (backend "dense"): one uint8 bit per spin.

TPU-native rebuild of the basic-tier CUDA kernels (basic_cuda/main.cu:54-90,
basic_python/ising_basic.py:73-134), but fused: where the reference launches
a cuRAND host-API kernel to fill a float buffer and then a separate update
kernel (basic_cuda/main.cu:132-144 — 2 kernels per color phase), here RNG
generation, neighbor stencil, threshold test and flip are one Pallas kernel;
random bits never touch HBM.

Structure (shared with the packed flagship kernel):
  * grid over row blocks; src/dst blocks stream through VMEM via BlockSpec
    (automatic double-buffering by Mosaic);
  * the +-1 halo rows each block needs come from two small (nblk, C) edge
    arrays built with strided slices (traffic ~1/BY of a full src copy,
    instead of re-reading neighbor blocks or concat-padding the plane);
  * in-kernel RNG: Philox4x32-10 (the library-wide reproducible contract,
    same jnp code as rng.py running inside the kernel) or the on-chip
    hardware PRNG (rng mode "hw", pltpu.prng_random_bits);
  * acceptance via a 10-entry uint32 threshold select-chain from SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import BLACK
from ..rng import (TAG_SWEEP, key_from_seed, mulhilo32, parse_rng_mode, plane_bits,
                   philox4x32, threefry2x32, threefry_stream_key)


def unsigned_le(a, b):
    """a <= b as unsigned uint32, via signed-domain bias.

    Mosaic on v5e was observed to mis-execute unsigned vector compares when
    operating on sub-128-lane (masked-vreg) shapes; XOR 0x80000000 on both
    sides makes the equivalent signed compare, which lowers correctly at
    every shape. Semantics are bit-identical to the unsigned compare.
    """
    bias = jnp.uint32(0x80000000)
    return (a ^ bias).astype(jnp.int32) <= (b ^ bias).astype(jnp.int32)


def _pick_block_rows(nrows: int, target: int = 256) -> int:
    """Row-block height: a multiple-of-8 divisor of nrows <= target (TPU
    sublane constraint when the grid has >1 block), else the whole plane."""
    best = nrows  # single block: always legal
    for by in range(8, min(nrows, target) + 1, 8):
        if nrows % by == 0:
            best = by
    return best


def _block_rows_for(nrows: int, width_words: int, rng_mode: str) -> int:
    """Block height bounded so kernel intermediates fit scoped VMEM (16 MB).

    width_words is the widest per-row intermediate in 32-bit words. The
    philox path keeps ~7 live unrolled-round arrays and chacha a 16-word
    state (tight cap — chacha8b was also measured fastest at the tight
    height); the other modes keep ~6 stencil/draw intermediates (looser
    cap)."""
    if parse_rng_mode(rng_mode)[0] in ("philox", "chacha"):
        cap = (1 << 16) // max(1, width_words)
        target = max(8, min(256, cap))
    else:
        cap = (1 << 21) // max(1, width_words)
        target = max(8, min(512, cap))
    return _pick_block_rows(nrows, target)


def _philox_draws(params_ref, rows: int, cols: int, row_block: int,
                  seed: int, tag: int, rounds: int = 10):
    """(rows, cols) uint32 draws for this grid block, philox contract.

    Counter derivation is identical to rng.color_draws: quad index
    q = global_row * (cols/4) + col mod (cols/4), slot = col div (cols/4);
    the slot assembly is a lane concatenation (Mosaic-supported).
    """
    i = pl.program_id(0)
    row0 = params_ref[0] + (i * row_block).astype(jnp.uint32)
    step = params_ref[1]
    nq = cols // 4
    y = jax.lax.broadcasted_iota(jnp.uint32, (rows, nq), 0) + row0
    q = jax.lax.broadcasted_iota(jnp.uint32, (rows, nq), 1)
    hi, lo = mulhilo32(y, jnp.uint32(nq))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    k0, k1 = key_from_seed(seed)
    o = philox4x32(c0, c1, step, jnp.uint32(tag), k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def _threefry_draws(params_ref, rows: int, cols: int, row_block: int,
                    seed: int, tag: int, rounds: int = 20):
    """(rows, cols) uint32 draws, identical contract to
    rng.threefry_color_draws (pair counter, stream-derived key)."""
    i = pl.program_id(0)
    row0 = params_ref[0] + (i * row_block).astype(jnp.uint32)
    step = params_ref[1]
    g = cols // 2
    y = jax.lax.broadcasted_iota(jnp.uint32, (rows, g), 0) + row0
    q = jax.lax.broadcasted_iota(jnp.uint32, (rows, g), 1)
    hi, lo = mulhilo32(y, jnp.uint32(g))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    k0, k1 = threefry_stream_key(seed, step, tag)
    o0, o1 = threefry2x32(c0, c1, k0, k1, rounds)
    return jnp.concatenate([o0, o1], axis=-1)


def _chacha_draws(params_ref, rows: int, cols: int, row_block: int,
                  seed: int, tag: int, rounds: int = 8):
    """(rows, cols) uint32 draws per rng.chacha_color_draws' contract
    (16-slot lane-group concat; (c0, c1, step, tag) counter row)."""
    from ..rng import chacha_block
    i = pl.program_id(0)
    row0 = params_ref[0] + (i * row_block).astype(jnp.uint32)
    step = params_ref[1]
    g = cols // 16
    y = jax.lax.broadcasted_iota(jnp.uint32, (rows, g), 0) + row0
    q = jax.lax.broadcasted_iota(jnp.uint32, (rows, g), 1)
    hi, lo = mulhilo32(y, jnp.uint32(g))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    k0, k1 = key_from_seed(seed)
    o = chacha_block(c0, c1, step, jnp.uint32(tag), k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def _hw_draws(params_ref, rows: int, cols: int, seed: int, tag: int):
    """On-chip PRNG path: seed from (seed, tag, step, block)."""
    i = pl.program_id(0)
    # Hardware PRNG takes at most 2 seed words: mix (step, tag, block) in.
    s0 = jnp.uint32(seed & 0xFFFFFFFF) ^ (params_ref[1] * jnp.uint32(0x9E3779B9))
    s1 = (jnp.uint32(((seed >> 32) ^ tag) & 0xFFFFFFFF)
          + (params_ref[0] + i.astype(jnp.uint32)) * jnp.uint32(0x85EBCA6B))
    pltpu.prng_seed(s0, s1)
    return pltpu.bitcast(pltpu.prng_random_bits((rows, cols)), jnp.uint32)


def _sweep_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                  *rest, color: int, row_block: int, seed: int,
                  rng_mode: str, disorder: bool, interp: bool = False):
    """One row block of a color sweep. rest = 4 J planes + out_ref."""
    out_ref = rest[-1]
    BY = row_block
    C = dst_ref.shape[1]

    i = pl.program_id(0)
    # Mosaic vector ALU supports only i16/i32: widen uint8 loads to int32.
    src = src_ref[...].astype(jnp.int32)
    # Edge arrays are passed whole ((nblk, C) int32, tiny); dynamic sublane
    # indexing needs a 32-bit element type (uint8 rows pack 4/sublane).
    up_row = up_ref[pl.ds(i, 1), :]
    dn_row = dn_ref[pl.ds(i, 1), :]
    up = jnp.concatenate([up_row, src[:-1]], axis=0)
    dn = jnp.concatenate([src[1:], dn_row], axis=0)
    left = pltpu.roll(src, 1, 1)
    right = pltpu.roll(src, C - 1, 1)  # roll takes non-negative shifts
    # Global row parity == local parity: row0 and BY are always even.
    odd = (jax.lax.broadcasted_iota(jnp.int32, (BY, C), 0) % 2) == 1
    same = src
    if color == BLACK:
        off = jnp.where(odd, right, left)
    else:
        off = jnp.where(odd, left, right)

    if disorder:
        j_up, j_dn, j_same, j_off = (r[...].astype(jnp.int32)
                                     for r in rest[:4])
        up = up ^ j_up
        dn = dn ^ j_dn
        same = same ^ j_same
        off = off ^ j_off

    dst = dst_ref[...].astype(jnp.int32)
    nsum = up + dn + same + off
    idx = dst * 5 + nsum

    tag = TAG_SWEEP | color
    family, rounds = parse_rng_mode(rng_mode)
    if family == "philox":
        draws = _philox_draws(params_ref, BY, C, BY, seed, tag, rounds)
    elif family == "threefry":
        draws = _threefry_draws(params_ref, BY, C, BY, seed, tag, rounds)
    elif family == "chacha":
        draws = _chacha_draws(params_ref, BY, C, BY, seed, tag, rounds)
    elif interp:
        # CPU interpreter lacks prng_seed; salted Philox substitute.
        draws = _philox_draws(params_ref, BY, C, BY, seed, tag | 0x8000)
    else:
        draws = _hw_draws(params_ref, BY, C, seed, tag)

    thr = jnp.zeros((BY, C), jnp.uint32)
    for k in range(10):
        thr = jnp.where(idx == k, thr_ref[k], thr)
    accept = unsigned_le(draws, thr).astype(jnp.int32)
    out_ref[...] = (dst ^ accept).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "color", "seed", "rng_mode", "interpret"))
def dense_sweep(dst, src, src_up, src_dn, thr10, row0, step, jplanes=None,
                *, color: int, seed: int, rng_mode: str = "philox",
                interpret: bool = False):
    """One color half-sweep over the whole (H, C) plane."""
    H, C = dst.shape
    # Widest intermediates: (BY, C) int32 stencil arrays (and in philox
    # mode the unrolled-round quad arrays of width C/4).
    BY = _block_rows_for(
        H, C // 4 if parse_rng_mode(rng_mode)[0] == "philox" else C, rng_mode)
    nblk = H // BY

    # Edge-row arrays: block i's missing halo rows. Row i of `ups` is the
    # global row i*BY - 1 of src (or the ppermuted halo for block 0);
    # row i of `dns` is global row (i+1)*BY (or the halo for the last block).
    if nblk > 1:
        ups = jnp.concatenate([src_up, src[BY - 1::BY][:-1]], axis=0)
        dns = jnp.concatenate([src[BY::BY], src_dn], axis=0)
    else:
        ups, dns = src_up, src_dn
    ups = ups.astype(jnp.int32)
    dns = dns.astype(jnp.int32)

    params = jnp.stack([row0.astype(jnp.uint32) if hasattr(row0, "astype")
                        else jnp.uint32(row0),
                        step.astype(jnp.uint32) if hasattr(step, "astype")
                        else jnp.uint32(step)])

    disorder = jplanes is not None
    jargs = tuple(jplanes) if disorder else ()

    blk = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    row_specs = [
        pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),     # dst
        pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),     # src
        pl.BlockSpec((nblk, C), whole, memory_space=pltpu.VMEM),  # up edges
        pl.BlockSpec((nblk, C), whole, memory_space=pltpu.VMEM),  # dn edges
    ]
    if disorder:
        row_specs += [pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM)] * 4

    kernel = functools.partial(
        _sweep_kernel, color=color, row_block=BY, seed=seed,
        rng_mode=rng_mode, disorder=disorder, interp=interpret)

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params (row0, step)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # thr10
            *row_specs,
        ],
        out_specs=pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C), jnp.uint8),
        input_output_aliases={2: 0},  # dst buffer reused for output
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, thr10, dst, src, ups, dns, *jargs)


class DenseBackend:
    """Backend adapter for the dense Pallas kernel."""

    name = "dense"
    bytes_per_spin = 1.0

    def __init__(self, cfg):
        if cfg.xsl is not None:
            raise NotImplementedError(
                "dense backend has no sub-lattice mode; use xla or packed")
        if plane_bits(cfg.rng):
            raise NotImplementedError(
                "bit-plane rng modes (...b) are implemented by the bit1 and "
                "xla backends (their storage matches the plane layout); use "
                "philox7/threefry13 here")
        self.cfg = cfg
        # Interpret mode on CPU makes the same kernel CI-testable.
        self.interpret = jax.default_backend() == "cpu"

    def encode(self, black_bits, white_bits):
        return black_bits, white_bits

    def decode(self, black_store, white_store):
        return black_store, white_store

    def update_color(self, dst, src, *, color, thr10, step, row0=0,
                     src_up=None, src_dn=None, jplanes=None):
        return dense_sweep(dst, src, src_up, src_dn, thr10,
                           jnp.uint32(row0), step, jplanes,
                           color=color, seed=self.cfg.seed,
                           rng_mode=self.cfg.rng, interpret=self.interpret)
