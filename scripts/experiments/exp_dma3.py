"""Experiment 3: what limits the manual pipeline to ~340 GB/s?

Variants:
  a) nocopy  — DMA planes through VMEM with NO VPU copies at all
               (bout reads straight from the input buffer slot).
  b) static  — same copies as exp_dma but with STATIC ring slots via an
               unrolled i%6 phase switch (no dynamic scratch indexing).
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def nocopy_kernel(bin_hbm, win_hbm, bout_hbm, wout_hbm,
                  bbuf, wbuf, bin_sem, win_sem, bout_sem, wout_sem,
                  *, BY, nblk):
    nb = nblk
    i = pl.program_id(0)

    def dma_in(hbm, buf, sem, blk, slot):
        return pltpu.make_async_copy(hbm.at[pl.ds(blk * BY, BY), :],
                                     buf.at[slot], sem.at[slot])

    def dma_out(buf, hbm, sem, blk, slot):
        return pltpu.make_async_copy(buf.at[slot],
                                     hbm.at[pl.ds(blk * BY, BY), :],
                                     sem.at[slot])

    # 4-deep rings; in-slot s is reused after out-DMA of the same slot done.
    @pl.when(i == 0)
    def _():
        dma_in(bin_hbm, bbuf, bin_sem, 0, 0).start()
        dma_in(win_hbm, wbuf, win_sem, 0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        @pl.when(i + 1 >= 4)
        def _():
            # slot (i+1)%4 last DMA'd out at step i-3; must be drained.
            dma_out(bbuf, bout_hbm, bout_sem, i - 3, (i + 1) % 4).wait()
            dma_out(wbuf, wout_hbm, wout_sem, i - 3, (i + 1) % 4).wait()
        dma_in(bin_hbm, bbuf, bin_sem, i + 1, (i + 1) % 4).start()
        dma_in(win_hbm, wbuf, win_sem, i + 1, (i + 1) % 4).start()

    @pl.when(i < nb)
    def _():
        dma_in(bin_hbm, bbuf, bin_sem, i, i % 4).wait()
        dma_in(win_hbm, wbuf, win_sem, i, i % 4).wait()
        dma_out(bbuf, bout_hbm, bout_sem, i, i % 4).start()
        dma_out(wbuf, wout_hbm, wout_sem, i, i % 4).start()

    @pl.when(i == nb + 1)
    def _():
        for blk in range(max(0, nb - 4), nb):
            dma_out(bbuf, bout_hbm, bout_sem, blk, blk % 4).wait()
            dma_out(wbuf, wout_hbm, wout_sem, blk, blk % 4).wait()


def run_nocopy(b, w, BY):
    H, W = b.shape
    nblk = H // BY
    k = functools.partial(nocopy_kernel, BY=BY, nblk=nblk)
    return pl.pallas_call(
        k,
        grid=(nblk + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((4, BY, W), jnp.uint32),
            pltpu.VMEM((4, BY, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(b, w)


def static_kernel(bin_hbm, win_hbm, bout_hbm, wout_hbm,
                  bbuf, wbuf, obuf, bin_sem, win_sem, bout_sem, wout_sem,
                  *, BY, nblk):
    """Same dataflow but with static slot indices, unrolled over i % 2."""
    nb = nblk
    i = pl.program_id(0)

    def dma_in(hbm, buf, sem, blk, slot):
        return pltpu.make_async_copy(hbm.at[pl.ds(blk * BY, BY), :],
                                     buf.at[slot], sem.at[slot])

    def dma_out(buf, hbm, sem, blk, slot):
        return pltpu.make_async_copy(buf.at[slot],
                                     hbm.at[pl.ds(blk * BY, BY), :],
                                     sem.at[slot])

    @pl.when(i == 0)
    def _():
        dma_in(bin_hbm, bbuf, bin_sem, 0, 0).start()
        dma_in(win_hbm, wbuf, win_sem, 0, 0).start()

    for par in (0, 1):  # static unroll over step parity
        @pl.when(jnp.logical_and(i % 2 == par, i + 1 < nb))
        def _(par=par):
            dma_in(bin_hbm, bbuf, bin_sem, i + 1, 1 - par).start()
            dma_in(win_hbm, wbuf, win_sem, i + 1, 1 - par).start()

        @pl.when(jnp.logical_and(i % 2 == par, i < nb))
        def _(par=par):
            @pl.when(i >= 2)
            def _():
                dma_out(obuf, bout_hbm, bout_sem, i - 2, par).wait()
                dma_out(obuf, wout_hbm, wout_sem, i - 2, 2 + par).wait()
            dma_in(bin_hbm, bbuf, bin_sem, i, par).wait()
            dma_in(win_hbm, wbuf, win_sem, i, par).wait()
            obuf[par] = bbuf[par] ^ jnp.uint32(1)       # static slots
            obuf[2 + par] = wbuf[par] ^ jnp.uint32(1)
            dma_out(obuf, bout_hbm, bout_sem, i, par).start()
            dma_out(obuf, wout_hbm, wout_sem, i, 2 + par).start()

    @pl.when(i == nb + 1)
    def _():
        for blk in (nb - 2, nb - 1):
            dma_out(obuf, bout_hbm, bout_sem, blk, blk % 2).wait()
            dma_out(obuf, wout_hbm, wout_sem, blk, 2 + blk % 2).wait()


def run_static(b, w, BY):
    H, W = b.shape
    nblk = H // BY
    k = functools.partial(static_kernel, BY=BY, nblk=nblk)
    return pl.pallas_call(
        k,
        grid=(nblk + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, BY, W), jnp.uint32),
            pltpu.VMEM((2, BY, W), jnp.uint32),
            pltpu.VMEM((4, BY, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((4,)),
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
    for name, fn in [("nocopy BY=512", lambda x, y: run_nocopy(x, y, 512)),
                     ("nocopy BY=1024", lambda x, y: run_nocopy(x, y, 1024)),
                     ("static BY=512", lambda x, y: run_static(x, y, 512)),
                     ("static BY=1024", lambda x, y: run_static(x, y, 1024))]:
        t = bench(fn, b, w)
        print(f"{name}: {t*1e3:.3f} ms/step -> {mb/1e3/t:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
