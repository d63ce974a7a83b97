"""Round-5 chacha4b decomposition: where do 355 of the possible ~520 go?

VERDICT r4 asked for the chacha analog of round 3's philox proof. Known:
genonly chacha4b measured 0.782 ms/step (343 flips/ns) in round 3 and the
full kernel 355 in round 4 — i.e. the tier IS generation-bound. This
experiment isolates the remaining candidate overheads inside generation:

  lib_full        — the real bit1_sweep (official path, scalar-counter
                    fast path active; the bench number's kernel)
  full_nogrows    — same but the 64-bit counter path (measures the r5
                    scalar-counter fast path's real effect)
  genonly         — draws + XOR fold only, concat layout (round-3 twin)
  genonly_split   — draws consumed as the 16 raw ChaCha output words
                    (no (BY, 16*W1) concat materialization, no re-slice:
                    plane z IS output word z when nq == W1)
  full_split      — the full accept pipeline on split planes (what the
                    library would ship if the concat costs real time)
  lib_full BY=...  — block-height sweep of the real kernel

Arithmetic model (for the writeup): chacha4 = 16 QRs x 20 vector ops +
16 feedforward adds = 336 ops per 16-word block = 21 ops/word; the
scalar-counter fast path folds 3 first-column-round QRs to the scalar
core -> ~276 vector ops = 17.25 ops/word. At the VPU's measured ~5.1
T ops/s (PERF.md round 3) those bound 16384^2 steps at 0.56 / 0.51
ms/step = 477 / 524 flips/ns. Anything measured slower is scheduling/
layout overhead; anything at the bound is the emission roofline.

Run: python scripts/experiments/exp_chacha2.py
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
from ising_tpu.ops.pallas_packed import _chacha_draw_block, _draw_counters
from ising_tpu.rng import TAG_SWEEP, chacha_block, key_from_seed

KBITS = 16


def _chacha_planes(params_ref, W1, row_block, seed, tag, blk, rounds,
                   grows):
    """The 16 raw ChaCha output words as (BY, W1) plane arrays — identical
    values to slicing the concat (plane z = output word z when nq == W1),
    with no (BY, 16*W1) buffer materialized."""
    c0, c1 = _draw_counters(params_ref, row_block, W1, row_block, blk,
                            grows)
    k0, k1 = key_from_seed(seed)
    return chacha_block(c0, c1, params_ref[1], jnp.uint32(tag), k0, k1,
                        rounds)


def _lt_planes_list(planes, t4k, t8k):
    """pb._bitserial_lt_planes on a plane LIST (same fold algebra)."""
    kbits = len(planes)
    coin = planes[0]
    a4 = a8 = None
    z = 0
    while z < kbits:
        pair = ((t4k >> z) & 1, (t8k >> z) & 1)
        z2 = z
        while z2 < kbits and ((t4k >> z2) & 1, (t8k >> z2) & 1) == pair:
            z2 += 1
        run = planes[z:z2]
        fand = for_ = None
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


def variant_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                   out_ref, *, color, row_block, seed, variant, rounds,
                   t4k, t8k, grows):
    BY = row_block
    W1 = dst_ref.shape[1]
    i = pl.program_id(0)
    me = dst_ref[...]
    src = src_ref[...]
    tag = TAG_SWEEP | color

    if variant == "genonly":
        draws = _chacha_draw_block(params_ref, BY, KBITS * W1, BY, seed,
                                   tag, blk=i, rounds=rounds, grows=grows)
        red = draws[:, 0:W1]
        for z in range(1, KBITS):
            red = red ^ draws[:, z * W1:(z + 1) * W1]
        out_ref[...] = me ^ red
        return
    if variant == "genonly_split":
        planes = _chacha_planes(params_ref, W1, BY, seed, tag, i, rounds,
                                grows)
        red = planes[0]
        for p in planes[1:]:
            red = red ^ p
        out_ref[...] = me ^ red
        return

    # full_split: the real accept pipeline on split planes
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
    planes = _chacha_planes(params_ref, W1, BY, seed, tag, i, rounds, grows)
    lt4, lt8, _coin = _lt_planes_list(planes, t4k, t8k)
    flip = (~ge3) | (ge3 & ~ge4 & lt4) | (ge4 & lt8)
    out_ref[...] = me ^ flip


def make_variant_sweep(variant, seed, BY, t4k, t8k, rounds, grows):
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
            variant=variant, rounds=rounds, t4k=t4k, t8k=t8k, grows=grows)
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
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--phase", type=int, default=1)
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    N = args.size
    seed = 463463564571
    t4k, t8k = ising.bernoulli_kbit_thresholds(1.5, KBITS)
    from ising_tpu import lattice
    b, w = lattice.init_bits(seed, N, N)
    b, w = pb.pack_bits1(b), pb.pack_bits1(w)
    thr = jnp.asarray(ising.threshold_table(1.5))
    W1 = N // 64
    BY0 = _block_rows_for(N, KBITS * W1, "chacha4b")
    mode = f"chacha{args.rounds}b"
    print(f"N={N} W1={W1} BY={BY0} t4k={t4k} t8k={t8k}", flush=True)

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

    def report(name, sweep):
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
        print(f"{name:24s}: {t * 1e3:.3f} ms/step "
              f"({N * N / t / 1e9:6.1f} flips/ns)", flush=True)
        return t

    # Library path (the official kernel), grows on and off, BY sweep.
    def lib_sweep(BY_override=None, grows=True):
        def sweep(dst, src, thr, step, color):
            return pb.bit1_sweep(
                dst, src, src[-1:], src[:1], thr, jnp.uint32(0), step,
                color=color, seed=seed, rng_mode=mode,
                t4k=t4k, t8k=t8k, kbits=KBITS,
                grows=N if grows else 0)
        return sweep

    if args.phase == 1:
        report("lib_full (official)", lib_sweep())
        report("lib_full grows=0", lib_sweep(grows=False))
        for variant in ("genonly", "genonly_split", "full_split"):
            report(variant, make_variant_sweep(variant, seed, BY0, t4k,
                                               t8k, args.rounds, grows=N))
        report("genonly grows=0", make_variant_sweep(
            "genonly", seed, BY0, t4k, t8k, args.rounds, grows=0))
        for BY in (8, 16, 32, 64, 128):
            if N % BY == 0 and BY != BY0:
                report(f"full_split BY={BY}", make_variant_sweep(
                    "full_split", seed, BY, t4k, t8k, args.rounds,
                    grows=N))
    else:
        # phase 2: the BY=64-512 region, grows on/off, repeated points
        # (the phase-1 sweep was single-shot; BY=64 looked anomalous)
        for BY in (64, 128, 192, 256, 512):
            if N % BY:
                continue
            for g in (N, 0):
                report(f"full_split BY={BY} grows={'N' if g else 0}",
                       make_variant_sweep("full_split", seed, BY, t4k,
                                          t8k, args.rounds, grows=g))
        report("full_split BY=128 r8", make_variant_sweep(
            "full_split", seed, 128, t4k, t8k, 8, grows=N))
        report("full_split BY=128 r6", make_variant_sweep(
            "full_split", seed, 128, t4k, t8k, 6, grows=N))
    if args.phase == 3:
        # rounds x BY matrix (split planes, grows=N): pick the library BY
        # per round count; phases 1-2 disagreed across windows, so
        # interleave a repeated anchor point to detect window drift.
        for BY in (16, 32, 64, 128):
            for r in (4, 6, 8):
                report(f"r{r} BY={BY}", make_variant_sweep(
                    "full_split", seed, BY, t4k, t8k, r, grows=N))
            report(f"anchor r4 BY=128 (rep)", make_variant_sweep(
                "full_split", seed, 128, t4k, t8k, 4, grows=N))


if __name__ == "__main__":
    sys.exit(main())
