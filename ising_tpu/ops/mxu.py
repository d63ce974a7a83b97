"""MXU backend ("mxu"): neighbor sums as banded bf16 matmuls, fused.

TPU-native rebuild of the reference's tensor-core tier (tensorcore/main.cu):
the reference builds a banded K matrix (1s on the diagonal and first
subdiagonal, set_k at tensorcore/main.cu:48-61), computes neighbor sums as
batched fp16 cublasGemmBatchedEx calls (:252-262) into a nn_sums buffer,
then runs an `add_boundaries` fix-up kernel (:148-226) and a Metropolis
kernel (:88-146) — three HBM round-trips per color phase.

Here the whole phase is ONE Pallas kernel per row block, everything in VMEM:

  * spins become +-1 bf16 on the compact plane; 128 is both the MXU tile
    size and the reference's sub-block geometry (LATTICE_SUB_N,
    tensorcore/main.cu:38);
  * vertical neighbor sum: one (BY, BY) band matmul per block (sub- +
    super-diagonal), block-edge rows fixed from the halo/edge arrays;
  * horizontal off-column sum: two (128, 128) band matmuls per column
    block, block-edge lanes fixed with whole-plane rolls;
  * every product/sum is exact in bf16 (values in [-4, 4]), so the derived
    neighbor counts — and therefore whole trajectories — are bit-identical
    to the xla/dense/packed backends under the shared counter-RNG contract;
  * the Metropolis epilogue (RNG draws + mirrored-count threshold select +
    XOR flip) runs in the same kernel; random bits never touch HBM.

Per-phase HBM traffic is read src + read dst + write dst (3 bytes/spin),
same as the dense tier — the r01 version staged bf16 planes and nn_sums
through HBM and ran 6x slower than dense for it.

Like the reference's tensorcore tier, this backend supports neither quenched
disorder nor sub-lattice replicas (tensorcore/main.cu has no -J/--xsl).
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
from .pallas_dense import (_chacha_draws, _hw_draws, _philox_draws,
                           _threefry_draws, unsigned_le)

TILE = 128


def _band(n: int, offset: int) -> np.ndarray:
    """(n, n) matrix with ones on the given diagonal."""
    m = np.zeros((n, n), np.float32)
    idx = np.arange(n - abs(offset))
    if offset >= 0:
        m[idx, idx + offset] = 1.0
    else:
        m[idx - offset, idx] = 1.0
    return m


def _pick_block_rows_128(nrows: int, target: int = 256) -> int:
    """Largest multiple-of-128 divisor of nrows <= target (else nrows)."""
    best = nrows
    for by in range(TILE, min(nrows, target) + 1, TILE):
        if nrows % by == 0:
            best = by
    return best


def _mxu_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                kv_ref, kl_ref, kr_ref, out_ref, *, color: int,
                row_block: int, seed: int, rng_mode: str, interp: bool):
    BY = row_block
    C = dst_ref.shape[1]
    i = pl.program_id(0)

    def to_bf16(x):
        # Mosaic has no direct u8/i32 -> bf16 cast; hop through f32.
        return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    s = 2.0 * to_bf16(src_ref[...]) - 1.0  # +-1 spins

    sf = s.astype(jnp.float32)

    # Vertical: band matmul gives s[r-1] + s[r+1] inside the block; the
    # block-edge rows come from the edge arrays (add_boundaries analog,
    # tensorcore/main.cu:148-226, but fused — no extra kernel/HBM pass).
    # The MXU accumulates in f32 (bf16 acc is rejected by Mosaic), so every
    # product/sum is exact: values stay small integers in [-4, 4].
    v = jnp.dot(kv_ref[...], s, preferred_element_type=jnp.float32)
    up_row = 2.0 * up_ref[pl.ds(i, 1), :].astype(jnp.float32) - 1.0
    dn_row = 2.0 * dn_ref[pl.ds(i, 1), :].astype(jnp.float32) - 1.0
    row_id = jax.lax.broadcasted_iota(jnp.int32, (BY, C), 0)
    v = jnp.where(row_id == 0, v + up_row, v)
    v = jnp.where(row_id == BY - 1, v + dn_row, v)

    # Horizontal: per 128-column block, band matmuls give the left/right
    # compact neighbor; block-edge lanes are patched from whole-plane rolls
    # (periodic across the row, the reference's super-block wrap).
    kl = kl_ref[...]
    kr = kr_ref[...]
    parts_l = []
    parts_r = []
    for k in range(C // TILE):
        blk = s[:, k * TILE:(k + 1) * TILE]
        parts_l.append(jnp.dot(blk, kl, preferred_element_type=jnp.float32))
        parts_r.append(jnp.dot(blk, kr, preferred_element_type=jnp.float32))
    left = jnp.concatenate(parts_l, axis=1)
    right = jnp.concatenate(parts_r, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BY, C), 1)
    left = jnp.where(lane % TILE == 0, pltpu.roll(sf, 1, 1), left)
    right = jnp.where(lane % TILE == TILE - 1, pltpu.roll(sf, C - 1, 1),
                      right)

    odd = (row_id % 2) == 1
    off = jnp.where(odd, right, left) if color == BLACK \
        else jnp.where(odd, left, right)

    total = v + sf + off  # sum of 4 neighbor spins, exact in f32
    n = ((total.astype(jnp.int32) + 4) >> 1)  # neighbor bit-count 0..4

    # Shared integer accept: mirrored count e = b ? n : 4-n collapses the
    # 2x5 table to three thresholds (same math as xla_ref.select_threshold).
    dst = dst_ref[...].astype(jnp.int32)
    e = jnp.where(dst == 1, n, 4 - n)
    thr = jnp.where(e < 2, jnp.uint32(0xFFFFFFFF),
                    jnp.where(e == 2, thr_ref[7],
                              jnp.where(e == 3, thr_ref[8], thr_ref[9])))

    tag = TAG_SWEEP | color
    family, rounds = parse_rng_mode(rng_mode)
    if family == "philox":
        draws = _philox_draws(params_ref, BY, C, BY, seed, tag, rounds)
    elif family == "threefry":
        draws = _threefry_draws(params_ref, BY, C, BY, seed, tag, rounds)
    elif family == "chacha":
        draws = _chacha_draws(params_ref, BY, C, BY, seed, tag, rounds)
    elif interp:
        draws = _philox_draws(params_ref, BY, C, BY, seed, tag | 0x8000)
    else:
        draws = _hw_draws(params_ref, BY, C, seed, tag)

    accept = unsigned_le(draws, thr).astype(jnp.int32)
    out_ref[...] = (dst ^ accept).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=(
    "color", "seed", "rng_mode", "interpret"))
def mxu_sweep(dst, src, src_up, src_dn, thr10, row0, step, *, color: int,
              seed: int, rng_mode: str = "philox", interpret: bool = False):
    """One color half-sweep over the (H, C) plane, MXU neighbor sums."""
    H, C = dst.shape
    BY = _pick_block_rows_128(H)
    nblk = H // BY

    if nblk > 1:
        ups = jnp.concatenate([src_up, src[BY - 1::BY][:-1]], axis=0)
        dns = jnp.concatenate([src[BY::BY], src_dn], axis=0)
    else:
        ups, dns = src_up, src_dn
    ups = ups.astype(jnp.int32)
    dns = dns.astype(jnp.int32)

    kv = jnp.asarray(_band(BY, 1) + _band(BY, -1), jnp.bfloat16)
    kl = jnp.asarray(_band(TILE, 1), jnp.bfloat16)   # out[i] = in[i-1]
    kr = jnp.asarray(_band(TILE, -1), jnp.bfloat16)  # out[i] = in[i+1]

    params = jnp.stack([row0.astype(jnp.uint32) if hasattr(row0, "astype")
                        else jnp.uint32(row0),
                        step.astype(jnp.uint32) if hasattr(step, "astype")
                        else jnp.uint32(step)])

    blk = lambda i: (i, 0)
    whole = lambda i: (0, 0)
    kernel = functools.partial(
        _mxu_kernel, color=color, row_block=BY, seed=seed,
        rng_mode=rng_mode, interp=interpret)

    return pl.pallas_call(
        kernel,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # params
            pl.BlockSpec(memory_space=pltpu.SMEM),                    # thr10
            pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),      # dst
            pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),      # src
            pl.BlockSpec((nblk, C), whole, memory_space=pltpu.VMEM),  # ups
            pl.BlockSpec((nblk, C), whole, memory_space=pltpu.VMEM),  # dns
            pl.BlockSpec((BY, BY), whole, memory_space=pltpu.VMEM),   # kv
            pl.BlockSpec((TILE, TILE), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, TILE), whole, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, C), jnp.uint8),
        input_output_aliases={2: 0},
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(params, thr10, dst, src, ups, dns, kv, kl, kr)


class MxuBackend:
    """Backend adapter: fused bf16-matmul neighbor sums + integer accept."""

    name = "mxu"
    bytes_per_spin = 1.0  # uint8 storage (bf16 staging lives in VMEM only)

    def __init__(self, cfg):
        if cfg.xsl is not None:
            raise NotImplementedError(
                "mxu backend has no sub-lattice mode (nor does the "
                "reference tensorcore tier)")
        if cfg.j_prob is not None:
            raise NotImplementedError(
                "mxu backend has no disorder mode (nor does the reference "
                "tensorcore tier)")
        if plane_bits(cfg.rng):
            raise NotImplementedError(
                "bit-plane rng modes (...b) are implemented by the bit1 and "
                "xla backends; use philox7/threefry13 here")
        if cfg.nrows % TILE or (cfg.ncols // 2) % TILE:
            raise ValueError(
                "mxu backend needs nrows and ncols/2 multiples of 128")
        if cfg.local_rows % TILE:
            raise ValueError(
                f"mxu backend needs the per-device slab height "
                f"({cfg.local_rows} = nrows/ndev) to be a multiple of 128")
        self.cfg = cfg
        self.interpret = jax.default_backend() == "cpu"

    def encode(self, black_bits, white_bits):
        return black_bits, white_bits

    def decode(self, black_store, white_store):
        return black_store, white_store

    def update_color(self, dst, src, *, color, thr10, step, row0=0,
                     src_up=None, src_dn=None, jplanes=None):
        assert jplanes is None
        return mxu_sweep(dst, src, src_up, src_dn, thr10,
                         jnp.uint32(row0), step, color=color,
                         seed=self.cfg.seed, rng_mode=self.cfg.rng,
                         interpret=self.interpret)
