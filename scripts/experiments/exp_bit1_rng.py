"""Decompose the bit1 reproducible-mode (philox7b/threefry13b) step budget.

Variants of the bit1 sweep at the 16384^2 bench shape, same BlockSpec
pipeline and traffic, isolating where the time goes:

  full       — the real kernel (the --rng mode under test)
  genonly    — counter draws generated and XOR-folded straight to the
               output (no stencil, no compare): generation + traffic
  hwswap     — the full pipeline but the counter draws replaced by hw
               PRNG bits of the SAME volume: everything except the
               counter generator
  genonly_hw — hw draws + fold: the hw generator's own generation cost
  norng      — stencil + class masks only (flip = ge3): stencil + traffic

Then:  counter-generation cost ~ full - hwswap + (genonly_hw - norng-ish)
       compare cost            ~ hwswap - norng - (genonly_hw - fold)
and the PERF.md op-count model is checked against the measured times.

Run: python scripts/experiments/exp_bit1_rng.py [--rng philox7b]
"""

import argparse
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
from ising_tpu.ops import pallas_bit1 as pb
from ising_tpu.ops.pallas_dense import _block_rows_for
from ising_tpu.ops.pallas_packed import (_hw_draw_block, _philox_draw_block,
                                         _threefry_draw_block)
from ising_tpu.rng import TAG_SWEEP, parse_rng_mode


def variant_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                   out_ref, *, color, row_block, seed, rng_mode, variant,
                   t4k, t8k, kbits):
    BY = row_block
    W1 = dst_ref.shape[1]
    i = pl.program_id(0)
    me = dst_ref[...]
    src = src_ref[...]
    tag = TAG_SWEEP | color
    family, rounds = parse_rng_mode(rng_mode)

    def counter_draws(cols):
        if family == "philox":
            return _philox_draw_block(params_ref, BY, cols, BY, seed, tag,
                                      blk=i, rounds=rounds)
        return _threefry_draw_block(params_ref, BY, cols, BY, seed, tag,
                                    blk=i, rounds=rounds)

    def fold(draws):
        red = draws[:, 0:W1]
        for z in range(1, kbits):
            red = red ^ draws[:, z * W1:(z + 1) * W1]
        return red

    if variant == "genonly":
        out_ref[...] = me ^ fold(counter_draws(kbits * W1))
        return
    if variant == "genonly_hw":
        out_ref[...] = me ^ fold(
            _hw_draw_block(params_ref, BY, kbits * W1, seed, tag, blk=i))
        return

    # stencil (same as the real kernel)
    up_row = up_ref[pl.ds(i, 1), :]
    dn_row = dn_ref[pl.ds(i, 1), :]
    up = jnp.concatenate([up_row, src[:-1]], axis=0)
    dn = jnp.concatenate([src[1:], dn_row], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BY, W1), 1)
    last = src[:, W1 - 1:W1]
    wrapL = (last << 1) | (last >> 31)
    left = jnp.where(lane == 0, wrapL, pltpu.roll(src, 1, 1))
    first = src[:, 0:1]
    wrapR = (first >> 1) | (first << 31)
    right = jnp.where(lane == W1 - 1, wrapR, pltpu.roll(src, W1 - 1, 1))
    odd = (jax.lax.broadcasted_iota(jnp.int32, (BY, W1), 0) % 2) == 1
    off = jnp.where(odd, right, left) if color == BLACK \
        else jnp.where(odd, left, right)
    ge3, ge4, eq2 = pb._neighbor_class_masks(me, up, dn, src, off)

    if variant == "norng":
        out_ref[...] = me ^ ge3
        return
    if variant == "hwswap":
        draws = _hw_draw_block(params_ref, BY, kbits * W1, seed, tag, blk=i)
    else:  # full
        draws = counter_draws(kbits * W1)
    lt4, lt8, _coin = pb._bitserial_lt_planes(draws, W1, kbits, t4k, t8k)
    flip = (~ge3) | (ge3 & ~ge4 & lt4) | (ge4 & lt8)
    out_ref[...] = me ^ flip


def make_sweep(variant, seed, BY, rng_mode, t4k, t8k, kbits):
    def sweep(dst, src, thr, step, color):
        H, W1 = dst.shape
        nblk = H // BY
        ups = jnp.concatenate([src[-1:], src[BY - 1::BY][:-1]], axis=0)
        dns = jnp.concatenate([src[BY::BY], src[:1]], axis=0)
        params = jnp.stack([jnp.uint32(0), step]).astype(jnp.uint32)
        blk = lambda i: (i, 0)
        whole = lambda i: (0, 0)
        kern = functools.partial(
            variant_kernel, color=color, row_block=BY, seed=seed,
            rng_mode=rng_mode, variant=variant, t4k=t4k, t8k=t8k,
            kbits=kbits)
        return pl.pallas_call(
            kern,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk, W1), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk, W1), whole, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BY, W1), blk, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W1), jnp.uint32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(params, thr, dst, src, ups, dns)
    return sweep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rng", default="philox7b",
                    choices=("philox7b", "threefry13b"))
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=48)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    N = args.size
    seed = 463463564571
    kbits = 16  # the "...b" contract's fixed plane count
    t4k, t8k = ising.bernoulli_kbit_thresholds(1.5, kbits)
    from ising_tpu import lattice
    b, w = lattice.init_bits(seed, N, N)
    b, w = pb.pack_bits1(b), pb.pack_bits1(w)
    thr = jnp.asarray(ising.threshold_table(1.5))
    W1 = N // 64
    BY = _block_rows_for(N, kbits * W1, args.rng)
    print(f"rng={args.rng} N={N} W1={W1} BY={BY} t4k={t4k} t8k={t8k}",
          flush=True)

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    def bench(loop, steps=args.steps, reps=5):
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

    results = {}
    for variant in ("full", "hwswap", "genonly", "genonly_hw", "norng"):
        sweep = make_sweep(variant, seed, BY, args.rng, t4k, t8k, kbits)

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
        results[variant] = t
        print(f"{variant:10s}: {t * 1e3:.3f} ms/step "
              f"({N * N / t / 1e9:6.1f} flips/ns)", flush=True)

    gen_counter = results["genonly"] - results["genonly_hw"]
    print(f"\ncounter-gen minus hw-gen (same volume): "
          f"{gen_counter * 1e3:.3f} ms/step", flush=True)
    print(f"full - hwswap (counter gen observed in situ): "
          f"{(results['full'] - results['hwswap']) * 1e3:.3f} ms/step",
          flush=True)
    print(f"hwswap - norng (hw gen + bit-serial compare): "
          f"{(results['hwswap'] - results['norng']) * 1e3:.3f} ms/step",
          flush=True)


if __name__ == "__main__":
    sys.exit(main())
