"""Experiment 4: decompose the two-call packed kernel's per-phase budget.

Variants of the packed sweep (same BlockSpec auto-pipeline, same traffic):
  full     — the real kernel (rng=hw)
  nodec    — stencil + e-classes + RNG, decision replaced by 1 op
  norng    — stencil + e-classes only
  stream   — pure 3-stream traffic (flip = src word)
Differences isolate decision, RNG, and stencil costs at the 16384^2 bench
shape, telling us whether a traffic-reduced (1-bit) layout would pay.
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ising_tpu.ops import pallas_packed as pp
from ising_tpu.ops.pallas_dense import _block_rows_for
from ising_tpu import lattice
from ising_tpu.models import ising
from ising_tpu.constants import BLACK, WHITE


def variant_kernel(params_ref, thr_ref, dst_ref, src_ref, up_ref, dn_ref,
                   out_ref, *, color, row_block, seed, variant):
    BY = row_block
    W = dst_ref.shape[1]
    i = pl.program_id(0)
    me = dst_ref[...]
    src = src_ref[...]
    if variant == "stream":
        out_ref[...] = me ^ src
        return
    up_row = up_ref[pl.ds(i, 1), :]
    dn_row = dn_ref[pl.ds(i, 1), :]
    up = jnp.concatenate([up_row, src[:-1]], axis=0)
    dn = jnp.concatenate([src[1:], dn_row], axis=0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (BY, W), 1)
    wrapL = (src[:, W - 1:W] << 4) | (src[:, W - 1:W] >> 28)
    left = jnp.where(lane == 0, wrapL, pltpu.roll(src, 1, 1))
    wrapR = (src[:, 0:1] >> 4) | (src[:, 0:1] << 28)
    right = jnp.where(lane == W - 1, wrapR, pltpu.roll(src, W - 1, 1))
    odd = (jax.lax.broadcasted_iota(jnp.int32, (BY, W), 0) % 2) == 1
    off = jnp.where(odd, right, left) if color == BLACK \
        else jnp.where(odd, left, right)
    nsum = up + dn + src + off
    m1 = me & pp.M1
    mask = (m1 << 4) - m1
    e = (nsum & mask) | ((jnp.uint32(0x44444444) - nsum) & ~mask)
    if variant == "norng":
        out_ref[...] = me ^ (e & pp.M1)
        return
    draws = pp._hw_draw_block(params_ref, BY, 8 * W, seed, 0, blk=i)
    if variant == "nodec":
        red = draws[:, 0:W]
        for z in range(1, 8):
            red = red ^ draws[:, z * W:(z + 1) * W]
        out_ref[...] = me ^ (e & red & pp.M1)
        return
    raise ValueError(variant)


def make_variant_sweep(variant, seed, BY):
    def sweep(dst, src, thr, step, color):
        H, W = dst.shape
        nblk = H // BY
        ups = jnp.concatenate([src[-1:], src[BY - 1::BY][:-1]], axis=0)
        dns = jnp.concatenate([src[BY::BY], src[:1]], axis=0)
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
                pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),
                pl.BlockSpec((nblk, W), whole, memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BY, W), blk, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.uint32),
            input_output_aliases={2: 0},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(params, thr, dst, src, ups, dns)
    return sweep


def main():
    N = 16384
    cfg_seed = 463463564571
    b, w = lattice.init_bits(cfg_seed, N, N)
    b = pp.pack_bits(b)
    w = pp.pack_bits(w)
    thr = jnp.asarray(ising.threshold_table(1.5))
    BY = _block_rows_for(N, 4 * (N // 16), "hw")
    print(f"BY = {BY}", flush=True)

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    def bench(loop, steps=96, reps=5):
        o = loop(b, w, jnp.uint32(0), 4); sync(o)
        diffs = []
        for r in range(reps):
            t0 = time.perf_counter(); o = loop(b, w, jnp.uint32(9 + r), steps); sync(o)
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter(); o = loop(b, w, jnp.uint32(99 + r), 2 * steps); sync(o)
            diffs.append(time.perf_counter() - t0 - t1)
        pos = sorted(d for d in diffs if d > 0) or [max(diffs)]
        return pos[len(pos) // 2] / steps

    # real kernel reference
    from ising_tpu import SimConfig, get_backend
    cfg = SimConfig(nrows=N, ncols=N, temp=1.5, backend="packed", rng="hw")
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
    print(f"full  : {t*1e3:.3f} ms/step ({16384**2/t/1e9:.0f} flips/ns)",
          flush=True)

    for variant in ("nodec", "norng", "stream"):
        sweep = make_variant_sweep(variant, cfg_seed, BY)

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
        print(f"{variant:6s}: {t*1e3:.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
