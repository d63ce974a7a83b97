"""Can a ChaCha-family generator beat Philox4x32-7 for the reproducible
bit-plane modes?

PERF.md's round-3 proof shows philox7b is generation-bound: Philox's
32x32 multiplies cost ~49 emulated vector ops per draw word on a VPU
with no vector mulhi32, and generating the 16 plane bits/spin alone
costs more than the whole step (~136 vs ~141 flips/ns). Threefry is
multiply-free but its serial add-rot-xor chain is latency-bound (~110).

ChaCha is the third point in that design space: multiply-free ARX like
Threefry, but with FOUR independent quarter-round chains per round
(the VPU can overlap them) and 16 output words per block — exactly the
k = 16 planes the "...b" contract consumes per spin word. Op count:
8 rounds x 4 QRs x (4 add + 4 xor + 4 rot[3 ops]) + 16-word feedforward
= ~41 ops/word vs philox7's ~49, with dependency depth ~5/word vs ~12.

This experiment measures, at the 16384^2 bench shape with the real bit1
pipeline/BlockSpec/traffic:

  full_philox7b / full_chacha8b   — the complete sweep kernel
  genonly_philox7b / genonly_chacha8b — draws + XOR fold only
  chacha4/chacha6 genonly         — the round-count scaling (cryptanalysis
                                    margin: best public ChaCha attacks
                                    reach 7 rounds; 8 is the accepted
                                    safe reduced-round variant)

Run: python scripts/experiments/exp_chacha.py
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
from ising_tpu.ops.pallas_packed import _philox_draw_block
from ising_tpu.rng import TAG_SWEEP, key_from_seed, rotl32

# "expand 32-byte k" + pi-digit pad words for the unused key lanes.
CHACHA_C = (0x61707865, 0x3320646E, 0x79622D32, 0x6B206574)
CHACHA_PAD = (0x243F6A88, 0x85A308D3, 0x13198A2E,
              0x03707344, 0xA4093822, 0x299F31D0)


def _qr(a, b, c, d):
    a = a + b
    d = rotl32(d ^ a, 16)
    c = c + d
    b = rotl32(b ^ c, 12)
    a = a + b
    d = rotl32(d ^ a, 8)
    c = c + d
    b = rotl32(b ^ c, 7)
    return a, b, c, d


def chacha_block(c0, c1, step, tag, k0, k1, rounds=8):
    """ChaCha-rounds block: 16 u32 outputs per (c0, c1, step, tag) counter."""
    u = jnp.uint32
    init = [u(CHACHA_C[0]), u(CHACHA_C[1]), u(CHACHA_C[2]), u(CHACHA_C[3]),
            u(k0), u(k1),
            u(CHACHA_PAD[0]), u(CHACHA_PAD[1]), u(CHACHA_PAD[2]),
            u(CHACHA_PAD[3]), u(CHACHA_PAD[4]), u(CHACHA_PAD[5]),
            c0.astype(jnp.uint32), c1.astype(jnp.uint32),
            jnp.asarray(step, jnp.uint32), u(tag)]
    x = list(init)
    for _ in range(rounds // 2):
        x[0], x[4], x[8], x[12] = _qr(x[0], x[4], x[8], x[12])
        x[1], x[5], x[9], x[13] = _qr(x[1], x[5], x[9], x[13])
        x[2], x[6], x[10], x[14] = _qr(x[2], x[6], x[10], x[14])
        x[3], x[7], x[11], x[15] = _qr(x[3], x[7], x[11], x[15])
        x[0], x[5], x[10], x[15] = _qr(x[0], x[5], x[10], x[15])
        x[1], x[6], x[11], x[12] = _qr(x[1], x[6], x[11], x[12])
        x[2], x[7], x[8], x[13] = _qr(x[2], x[7], x[8], x[13])
        x[3], x[4], x[9], x[14] = _qr(x[3], x[4], x[9], x[14])
    return [a + b for a, b in zip(x, init)]


def _chacha_draw_block(params_ref, rows, cols, row_block, seed, tag,
                       blk, rounds=8):
    """(rows, cols) u32 draws; one block call = 16 output slots."""
    i = blk
    row0 = params_ref[0] + (i * row_block).astype(jnp.uint32)
    step = params_ref[1]
    nq = cols // 16
    y = jax.lax.broadcasted_iota(jnp.uint32, (rows, nq), 0) + row0
    q = jax.lax.broadcasted_iota(jnp.uint32, (rows, nq), 1)
    from ising_tpu.rng import mulhilo32
    hi, lo = mulhilo32(y, jnp.uint32(nq))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    k0, k1 = key_from_seed(seed)
    o = chacha_block(c0, c1, step, tag, k0, k1, rounds)
    return jnp.concatenate(o, axis=-1)


def variant_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                   out_ref, *, color, row_block, seed, gen, variant,
                   t4k, t8k, kbits):
    BY = row_block
    W1 = dst_ref.shape[1]
    i = pl.program_id(0)
    me = dst_ref[...]
    src = src_ref[...]
    tag = TAG_SWEEP | color

    def draws_of(cols):
        if gen == "philox7b":
            return _philox_draw_block(params_ref, BY, cols, BY, seed, tag,
                                      blk=i, rounds=7)
        rounds = int(gen[len("chacha"):-1])
        return _chacha_draw_block(params_ref, BY, cols, BY, seed, tag,
                                  blk=i, rounds=rounds)

    if variant == "genonly":
        draws = draws_of(kbits * W1)
        red = draws[:, 0:W1]
        for z in range(1, kbits):
            red = red ^ draws[:, z * W1:(z + 1) * W1]
        out_ref[...] = me ^ red
        return

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
    draws = draws_of(kbits * W1)
    lt4, lt8, _coin = pb._bitserial_lt_planes(draws, W1, kbits, t4k, t8k)
    flip = (~ge3) | (ge3 & ~ge4 & lt4) | (ge4 & lt8)
    out_ref[...] = me ^ flip


def make_sweep(variant, gen, seed, BY, t4k, t8k, kbits):
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
            gen=gen, variant=variant, t4k=t4k, t8k=t8k, kbits=kbits)
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
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=48)
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    N = args.size
    seed = 463463564571
    kbits = 16
    t4k, t8k = ising.bernoulli_kbit_thresholds(1.5, kbits)
    from ising_tpu import lattice
    b, w = lattice.init_bits(seed, N, N)
    b, w = pb.pack_bits1(b), pb.pack_bits1(w)
    thr = jnp.asarray(ising.threshold_table(1.5))
    W1 = N // 64
    BY = _block_rows_for(N, kbits * W1, "philox7b")
    print(f"N={N} W1={W1} BY={BY}", flush=True)

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

    cases = [("genonly", "philox7b"), ("genonly", "chacha8b"),
             ("genonly", "chacha6b"), ("genonly", "chacha4b"),
             ("full", "philox7b"), ("full", "chacha8b")]
    for variant, gen in cases:
        sweep = make_sweep(variant, gen, seed, BY, t4k, t8k, kbits)

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
        print(f"{variant:8s} {gen:10s}: {t * 1e3:.3f} ms/step "
              f"({N * N / t / 1e9:6.1f} flips/ns)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
