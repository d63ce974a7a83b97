"""Statistical verification of hw-mode acceptance on the real TPU.

The counter rng modes are gated by bit-exact TPU-vs-CPU comparison
(scripts/verify_tpu.py); hw mode (pltpu.prng_random_bits) has no
reproducible ground truth, so its gate is statistical: measure the realized
flip frequency of every (own bit, neighbor sum) Metropolis class on the
compiled TPU kernel and require agreement with the exact acceptance
probabilities within a 5-sigma binomial band. This catches wrong threshold
wiring, biased draws, class mix-ups, and Mosaic miscompiles of the
bit-serial accept path (pallas_bit1._bitserial_lt_planes) at full register
widths — which interpret-mode CPU tests cannot.

Run on the machine with the TPU attached (ONE TPU process at a time):

    python scripts/verify_hw_stats.py              # bit1 + packed, ~1 min
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def check_backend(jax, jnp, backend: str, *, nrows, ncols, temp, steps,
                  seed=1234, field=0.0):
    from ising_tpu import SimConfig, get_backend, lattice
    from ising_tpu.constants import BLACK, WHITE
    from ising_tpu.models import ising

    cfg = SimConfig(nrows=nrows, ncols=ncols, temp=temp, seed=seed,
                    backend=backend, rng="hw", field=field)
    be = get_backend(cfg)
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature, field))
    flips = np.zeros((2, 5))
    counts = np.zeros((2, 5))
    bs, ws = be.encode(b, w)
    t0 = time.time()
    for step in range(steps):
        bb, wb = be.decode(bs, ws)
        full = np.asarray(jax.device_get(
            lattice.compact_to_full(bb, wb))).astype(np.int64)
        nn = (np.roll(full, 1, 0) + np.roll(full, -1, 0)
              + np.roll(full, 1, 1) + np.roll(full, -1, 1))
        color = (np.indices(full.shape).sum(axis=0) + 1) % 2  # 1 where black
        new_bs = be.update_color(bs, ws, color=BLACK, thr10=thr,
                                 step=jnp.uint32(step),
                                 src_up=ws[-1:], src_dn=ws[:1])
        nb, _ = be.decode(new_bs, ws)
        new_full = np.asarray(jax.device_get(lattice.compact_to_full(nb, wb)))
        flipped = (new_full != full) & (color == 1)
        for bbit in range(2):
            for n in range(5):
                m = (color == 1) & (full == bbit) & (nn == n)
                counts[bbit, n] += m.sum()
                flips[bbit, n] += (m & flipped).sum()
        bs = new_bs
        ws = be.update_color(ws, bs, color=WHITE, thr10=thr,
                             step=jnp.uint32(step),
                             src_up=bs[-1:], src_dn=bs[:1])

    p = ising.acceptance_probabilities(temp, field)
    ok = True
    worst = 0.0
    for bbit in range(2):
        for n in range(5):
            if counts[bbit, n] < 1000:
                continue
            expect = min(1.0, p[bbit, n])
            got = flips[bbit, n] / counts[bbit, n]
            sigma = math.sqrt(max(expect * (1 - expect), 1e-12)
                              / counts[bbit, n])
            z = abs(got - expect) / max(sigma, 1e-12)
            worst = max(worst, z)
            if z > 5.0 and abs(got - expect) > 1e-4:
                ok = False
                print(f"  [FAIL] {backend} class(b={bbit},n={n}): "
                      f"got {got:.6f} expect {expect:.6f} "
                      f"({z:.1f} sigma, N={int(counts[bbit, n])})",
                      flush=True)
    status = "OK " if ok else "FAIL"
    if field:
        backend = f"{backend} h={field}"
    print(f"  [{status}] {backend} {nrows}x{ncols} T={temp} hw: "
          f"worst class deviation {worst:.2f} sigma "
          f"({int(counts.sum())} classified sites, {time.time()-t0:.1f}s)",
          flush=True)
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    print(f"verify_hw_stats: compiled platform = {plat}", flush=True)

    ok = True
    # bit1's TPU width constraint is ncols % 8192; packed's is % 2048.
    ok &= check_backend(jax, jnp, "bit1", nrows=512, ncols=8192, temp=2.0,
                        steps=args.steps)
    ok &= check_backend(jax, jnp, "bit1", nrows=512, ncols=8192, temp=1.5,
                        steps=args.steps)
    # T = 0 greedy quench: dE<0 always flips, dE==0 coin-flips at 1/2
    # (the bit-serial path's plane-0 coin), dE>0 never — from a random
    # start all classes are populated on the first sweeps.
    ok &= check_backend(jax, jnp, "bit1", nrows=512, ncols=8192, temp=0.0,
                        steps=3)
    ok &= check_backend(jax, jnp, "packed", nrows=512, ncols=4096, temp=2.0,
                        steps=args.steps)
    # External field on bit1+hw: the 10-class bit-serial accept's static
    # k-bit thresholds have no mirror symmetry left to cancel a wiring
    # bug, so every class is checked against its own exp(-dE/T).
    ok &= check_backend(jax, jnp, "bit1", nrows=512, ncols=8192, temp=2.0,
                        steps=args.steps, field=0.75)
    print("verify_hw_stats: ALL WITHIN 5 SIGMA" if ok
          else "verify_hw_stats: FAILURES", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
