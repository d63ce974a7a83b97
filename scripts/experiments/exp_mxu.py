"""Decompose the mxu tier's per-phase budget at the 8192^2 bench shape.

Variants of the fused MXU sweep (same BlockSpec pipeline, same traffic):

  full     — the real kernel (rng=hw): matmuls + epilogue
  nomm     — band matmuls replaced by VPU rolls (dense-style stencil),
             everything else identical: isolates the matmul cost
  norng    — matmuls + class logic, accept replaced by 1 op: isolates the
             draw+compare epilogue
  stream   — pure 3-stream uint8 traffic

The numbers explain the gap to the packed tier: the epilogue runs one
spin per 32-bit lane (uint8 planes widened to i32 for the compare), an
8x lane-efficiency deficit vs the packed tier's 8 spins/word — the
same reason the reference's tensorcore tier trails its optimized tier.

Run: python scripts/experiments/exp_mxu.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ising_tpu.constants import BLACK, WHITE
from ising_tpu.models import ising
from ising_tpu.ops import mxu as mx
from ising_tpu.ops.pallas_dense import _hw_draws, unsigned_le
from ising_tpu.rng import TAG_SWEEP


def variant_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                   kv_ref, kl_ref, kr_ref, out_ref, *, color, row_block,
                   seed, variant):
    BY = row_block
    C = dst_ref.shape[1]
    i = pl.program_id(0)
    if variant == "stream":
        out_ref[...] = dst_ref[...] ^ src_ref[...]
        return

    def to_bf16(x):
        return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    s = 2.0 * to_bf16(src_ref[...]) - 1.0
    sf = s.astype(jnp.float32)
    row_id = jax.lax.broadcasted_iota(jnp.int32, (BY, C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BY, C), 1)
    up_row = 2.0 * up_ref[pl.ds(i, 1), :].astype(jnp.float32) - 1.0
    dn_row = 2.0 * dn_ref[pl.ds(i, 1), :].astype(jnp.float32) - 1.0

    if variant == "nomm":
        # VPU shifts instead of matmuls (dense-style), same numerics.
        up = jnp.concatenate([up_row, sf[:-1]], axis=0)
        dn = jnp.concatenate([sf[1:], dn_row], axis=0)
        v = up + dn
        left = pltpu.roll(sf, 1, 1)
        right = pltpu.roll(sf, C - 1, 1)
    else:
        v = jnp.dot(kv_ref[...], s, preferred_element_type=jnp.float32)
        v = jnp.where(row_id == 0, v + up_row, v)
        v = jnp.where(row_id == BY - 1, v + dn_row, v)
        kl = kl_ref[...]
        kr = kr_ref[...]
        parts_l, parts_r = [], []
        for k in range(C // mx.TILE):
            blk = s[:, k * mx.TILE:(k + 1) * mx.TILE]
            parts_l.append(jnp.dot(blk, kl,
                                   preferred_element_type=jnp.float32))
            parts_r.append(jnp.dot(blk, kr,
                                   preferred_element_type=jnp.float32))
        left = jnp.concatenate(parts_l, axis=1)
        right = jnp.concatenate(parts_r, axis=1)
        left = jnp.where(lane % mx.TILE == 0, pltpu.roll(sf, 1, 1), left)
        right = jnp.where(lane % mx.TILE == mx.TILE - 1,
                          pltpu.roll(sf, C - 1, 1), right)

    odd = (row_id % 2) == 1
    off = jnp.where(odd, right, left) if color == BLACK \
        else jnp.where(odd, left, right)
    total = v + sf + off
    n = ((total.astype(jnp.int32) + 4) >> 1)
    dst = dst_ref[...].astype(jnp.int32)
    e = jnp.where(dst == 1, n, 4 - n)

    if variant == "norng":
        out_ref[...] = (dst ^ (e & 1)).astype(jnp.uint8)
        return

    thr = jnp.where(e < 2, jnp.uint32(0xFFFFFFFF),
                    jnp.where(e == 2, thr_ref[7],
                              jnp.where(e == 3, thr_ref[8], thr_ref[9])))
    draws = _hw_draws(params_ref, BY, C, seed, TAG_SWEEP | color)
    accept = unsigned_le(draws, thr).astype(jnp.int32)
    out_ref[...] = (dst ^ accept).astype(jnp.uint8)


def make_sweep(variant, seed, BY):
    def sweep(dst, src, thr, step, color):
        H, C = dst.shape
        nblk = H // BY
        ups = jnp.concatenate([src[-1:], src[BY - 1::BY][:-1]],
                              axis=0).astype(jnp.int32)
        dns = jnp.concatenate([src[BY::BY], src[:1]],
                              axis=0).astype(jnp.int32)
        kv = jnp.asarray(mx._band(BY, 1) + mx._band(BY, -1), jnp.bfloat16)
        kl = jnp.asarray(mx._band(mx.TILE, 1), jnp.bfloat16)
        kr = jnp.asarray(mx._band(mx.TILE, -1), jnp.bfloat16)
        params = jnp.stack([jnp.uint32(0), step]).astype(jnp.uint32)
        blk = lambda i: (i, 0)
        whole = lambda i: (0, 0)
        kern = functools.partial(variant_kernel, color=color, row_block=BY,
                                 seed=seed, variant=variant)
        return pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk, C), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk, C), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((BY, BY), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((mx.TILE, mx.TILE), whole,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((mx.TILE, mx.TILE), whole,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BY, C), blk, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, C), jnp.uint8),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(params, thr, dst, src, ups, dns, kv, kl, kr)
    return sweep


def main():
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    N = 8192
    seed = 463463564571
    from ising_tpu import SimConfig, get_backend, lattice
    b, w = lattice.init_bits(seed, N, N)
    thr = jnp.asarray(ising.threshold_table(1.5))
    BY = mx._pick_block_rows_128(N)
    print(f"N={N} BY={BY}", flush=True)

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    def bench(loop, steps=48, reps=5):
        o = loop(b, w, jnp.uint32(0), 4)
        sync(o)
        diffs = []
        for r in range(reps):
            t0 = time.perf_counter()
            o = loop(b, w, jnp.uint32(9 + r), steps)
            sync(o)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            o = loop(b, w, jnp.uint32(99 + r), 2 * steps)
            sync(o)
            diffs.append(time.perf_counter() - t0 - t1)
        pos = sorted(d for d in diffs if d > 0) or [max(diffs)]
        return pos[len(pos) // 2] / steps

    cfg = SimConfig(nrows=N, ncols=N, temp=1.5, backend="mxu", rng="hw")
    be = get_backend(cfg)

    @jax.jit
    def loop_full(b, w, s0, n):
        def body(i, bw):
            bb, ww = bw
            s = s0 + i.astype(jnp.uint32)
            bb = be.update_color(bb, ww, color=BLACK, thr10=thr, step=s,
                                 src_up=ww[-1:], src_dn=ww[:1])
            ww = be.update_color(ww, bb, color=WHITE, thr10=thr, step=s,
                                 src_up=bb[-1:], src_dn=bb[:1])
            return bb, ww
        return jax.lax.fori_loop(0, n, body, (b, w))

    t = bench(loop_full)
    print(f"full  : {t * 1e3:.3f} ms/step ({N * N / t / 1e9:5.1f} flips/ns)",
          flush=True)

    for variant in ("nomm", "norng", "stream"):
        sweep = make_sweep(variant, seed, BY)

        @jax.jit
        def loop(b, w, s0, n, sweep=sweep):
            def body(i, bw):
                bb, ww = bw
                s = s0 + i.astype(jnp.uint32)
                bb = sweep(bb, ww, thr, s, BLACK)
                ww = sweep(ww, bb, thr, s, WHITE)
                return bb, ww
            return jax.lax.fori_loop(0, n, body, (b, w))

        t = bench(loop)
        print(f"{variant:6s}: {t * 1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    sys.exit(main())
