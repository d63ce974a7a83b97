"""Experiment 2: does striping each block transfer across S sub-DMAs (on
distinct semaphores) raise manual-DMA bandwidth to auto-pipeline levels?

Also prints a pure-XLA two-plane copy bound for reference.
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel(bin_hbm, win_hbm, bout_hbm, wout_hbm,
           bbuf, wbuf, nbring, wobuf,
           bin_sem, win_sem, bout_sem, wout_sem, *, BY, nblk, S):
    nb = nblk
    i = pl.program_id(0)
    CH = BY // S  # stripe height

    def striped(src_hbm_or_buf, dst, sems, slot, blk, hbm_is_src):
        dmas = []
        for s in range(S):
            rows = pl.ds(blk * BY + s * CH, CH)
            sub = pl.ds(s * CH, CH)
            if hbm_is_src:
                d = pltpu.make_async_copy(src_hbm_or_buf.at[rows, :],
                                          dst.at[slot, sub, :],
                                          sems.at[slot, s])
            else:
                d = pltpu.make_async_copy(src_hbm_or_buf.at[slot, sub, :],
                                          dst.at[rows, :],
                                          sems.at[slot, s])
            dmas.append(d)
        return dmas

    bin_dma = lambda blk, slot: striped(bin_hbm, bbuf, bin_sem, slot, blk, True)
    win_dma = lambda blk, slot: striped(win_hbm, wbuf, win_sem, slot, blk, True)
    bout_dma = lambda blk, slot: striped(nbring, bout_hbm, bout_sem, slot, blk, False)
    wout_dma = lambda blk, slot: striped(wobuf, wout_hbm, wout_sem, slot, blk, False)

    def start(dmas):
        for d in dmas:
            d.start()

    def wait(dmas):
        for d in dmas:
            d.wait()

    @pl.when(i == 0)
    def _():
        start(bin_dma(0, 0))
        start(win_dma(0, 0))

    @pl.when(i + 1 < nb)
    def _():
        start(bin_dma(i + 1, (i + 1) % 2))
        start(win_dma(i + 1, (i + 1) % 3))

    @pl.when(i < nb)
    def _():
        @pl.when(i >= 3)
        def _():
            wait(bout_dma(i - 3, i % 3))
        wait(bin_dma(i, i % 2))
        wait(win_dma(i, i % 3))
        nbring[i % 3] = bbuf[i % 2] ^ jnp.uint32(1)
        start(bout_dma(i, i % 3))

    @pl.when(jnp.logical_and(i >= 4, i <= nb + 1))
    def _():
        wait(wout_dma(i - 3, i % 2))

    @pl.when(jnp.logical_and(i >= 2, i <= nb))
    def _():
        k = jnp.minimum(i - 1, nb - 1)
        wobuf[i % 2] = wbuf[k % 3] ^ jnp.uint32(1)
        start(wout_dma(k, i % 2))

    @pl.when(i == nb + 1)
    def _():
        wobuf[i % 2] = wbuf[0] ^ jnp.uint32(1)
        start(wout_dma(0, i % 2))
        for blk in range(max(0, nb - 3), nb):
            wait(bout_dma(blk, blk % 3))
        wait(wout_dma(nb - 1, nb % 2))
        wait(wout_dma(0, (nb + 1) % 2))


def run(b, w, BY, S):
    H, W = b.shape
    nblk = H // BY
    k = functools.partial(kernel, BY=BY, nblk=nblk, S=S)
    return pl.pallas_call(
        k,
        grid=(nblk + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, BY, W), jnp.uint32),
            pltpu.VMEM((3, BY, W), jnp.uint32),
            pltpu.VMEM((3, BY, W), jnp.uint32),
            pltpu.VMEM((2, BY, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, S)),
            pltpu.SemaphoreType.DMA((3, S)),
            pltpu.SemaphoreType.DMA((3, S)),
            pltpu.SemaphoreType.DMA((2, S)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(b, w)


def bench(fn, b, w, steps=48, reps=5):
    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    @jax.jit
    def loop(b, w, n):
        def body(i, bw):
            return fn(bw[0] ^ i.astype(jnp.uint32), bw[1])
        return jax.lax.fori_loop(0, n, body, (b, w))

    o = loop(b, w, 2); sync(o)
    diffs = []
    for r in range(reps):
        t0 = time.perf_counter(); o = loop(b, w, steps); sync(o)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter(); o = loop(b, w, 2 * steps); sync(o)
        diffs.append(time.perf_counter() - t0 - t1)
    pos = sorted(d for d in diffs if d > 0) or [max(diffs)]
    return pos[len(pos) // 2] / steps


def main():
    N = 16384
    H, W = N, N // 16
    b = jax.random.bits(jax.random.key(0), (H, W), dtype=jnp.uint32)
    w = b ^ jnp.uint32(7)
    mb = 4 * H * W * 4 / 1e6

    # Pure-XLA copy bound: 2 reads + 2 writes of the same planes.
    t = bench(lambda x, y: (x ^ jnp.uint32(3), y ^ jnp.uint32(5)), b, w)
    print(f"xla 2R+2W bound: {t*1e3:.3f} ms -> {mb/1e3/t:.0f} GB/s", flush=True)

    for BY, S in [(512, 1), (512, 4), (1024, 4), (1024, 8), (512, 8)]:
        t = bench(lambda x, y, BY=BY, S=S: run(x, y, BY, S), b, w)
        print(f"BY={BY} S={S}: {t*1e3:.3f} ms/step -> {mb/1e3/t:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
