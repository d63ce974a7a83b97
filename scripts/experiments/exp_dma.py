"""Experiment: isolate the manual-DMA pipeline cost of the fused-v2 schedule.

Runs the same grid/DMA schedule as _fused_manual_kernel but with compute
replaced by trivial copies, and compares against (a) the full fused-v2
kernel and (b) a pure HBM copy bound. Diagnoses whether fused-v2's gap to
the 4-plane roofline is DMA-pipeline inefficiency or compute overlap.
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dma_only_kernel(bin_hbm, win_hbm, bout_hbm, wout_hbm,
                    bbuf, wbuf, nbring, wobuf,
                    bin_sem, win_sem, bout_sem, wout_sem, *, BY, nblk):
    nb = nblk
    i = pl.program_id(0)

    def bin_dma(blk, slot):
        return pltpu.make_async_copy(
            bin_hbm.at[pl.ds(blk * BY, BY), :], bbuf.at[slot], bin_sem.at[slot])

    def win_dma(blk, slot):
        return pltpu.make_async_copy(
            win_hbm.at[pl.ds(blk * BY, BY), :], wbuf.at[slot], win_sem.at[slot])

    def bout_dma(blk, slot):
        return pltpu.make_async_copy(
            nbring.at[slot], bout_hbm.at[pl.ds(blk * BY, BY), :], bout_sem.at[slot])

    def wout_dma(blk, slot):
        return pltpu.make_async_copy(
            wobuf.at[slot], wout_hbm.at[pl.ds(blk * BY, BY), :], wout_sem.at[slot])

    @pl.when(i == 0)
    def _():
        bin_dma(0, 0).start()
        win_dma(0, 0).start()

    @pl.when(i + 1 < nb)
    def _():
        bin_dma(i + 1, (i + 1) % 2).start()
        win_dma(i + 1, (i + 1) % 3).start()

    @pl.when(i < nb)
    def _():
        @pl.when(i >= 3)
        def _():
            bout_dma(i - 3, i % 3).wait()
        bin_dma(i, i % 2).wait()
        win_dma(i, i % 3).wait()
        nbring[i % 3] = bbuf[i % 2] ^ jnp.uint32(1)   # trivial "compute"
        bout_dma(i, i % 3).start()

    @pl.when(jnp.logical_and(i >= 4, i <= nb + 1))
    def _():
        wout_dma(i - 3, i % 2).wait()

    @pl.when(jnp.logical_and(i >= 2, i <= nb))
    def _():
        k = jnp.minimum(i - 1, nb - 1)
        wobuf[i % 2] = wbuf[k % 3] ^ jnp.uint32(1)
        wout_dma(k, i % 2).start()

    @pl.when(i == nb + 1)
    def _():
        wobuf[i % 2] = wbuf[0 % 3] ^ jnp.uint32(1)
        wout_dma(0, i % 2).start()
        for blk in range(max(0, nb - 3), nb):
            bout_dma(blk, blk % 3).wait()
        wout_dma(nb - 1, nb % 2).wait()
        wout_dma(0, (nb + 1) % 2).wait()


def run_dma_only(b, w, BY):
    H, W = b.shape
    nblk = H // BY
    kernel = functools.partial(dma_only_kernel, BY=BY, nblk=nblk)
    return pl.pallas_call(
        kernel,
        grid=(nblk + 2,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
        out_shape=[jax.ShapeDtypeStruct((H, W), jnp.uint32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, BY, W), jnp.uint32),
            pltpu.VMEM((3, BY, W), jnp.uint32),
            pltpu.VMEM((3, BY, W), jnp.uint32),
            pltpu.VMEM((2, BY, W), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(b, w)


def main():
    N = 16384
    H, W = N, N // 16
    key = jax.random.key(0)
    b = jax.random.bits(key, (H, W), dtype=jnp.uint32)
    w = b ^ jnp.uint32(7)

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    for BY in (512, 1024, 2048, 4096):
        @jax.jit
        def loop(b, w, n, BY=BY):
            def body(i, bw):
                return run_dma_only(bw[0] ^ i.astype(jnp.uint32), bw[1], BY)
            return jax.lax.fori_loop(0, n, body, (b, w))

        ob, ow = loop(b, w, 2)
        sync((ob, ow))
        for steps in (48,):
            diffs = []
            for r in range(5):
                t0 = time.perf_counter()
                o = loop(b, w, steps)
                sync(o)
                t1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                o = loop(b, w, 2 * steps)
                sync(o)
                diffs.append(time.perf_counter() - t0 - t1)
            pos = sorted(d for d in diffs if d > 0) or [max(diffs)]
            med = pos[len(pos) // 2] / steps
            mb = 4 * H * W * 4 / 1e6
            print(f"BY={BY}: {med*1e3:.3f} ms/step for {mb:.0f} MB "
                  f"-> {mb/1e3/med:.0f} GB/s effective", flush=True)


if __name__ == "__main__":
    main()
