"""Sharded-stepper overhead on ONE real chip (weak-scaling datum).

The reference publishes 8-GPU weak scaling at 99.4% efficiency
(optimized/README.md:318). Real multi-chip hardware is unavailable here,
but the fixed cost of the multi-device code path — shard_map tracing,
the ppermute halo exchange, axis_index row offsets, the non-fused
two-call sweep — IS measurable on one chip: route ndev=1 through the
full collective path (make_sharded_stepper(force_collectives=True),
1-device mesh, self-ppermute) and compare against the plain path at the
bench shape. Per the counter contract both produce bit-identical
trajectories (asserted here).

The weak-scaling projection then rests on a measured number: per-chip
efficiency at N chips >= (t_plain / t_collective) on one chip, minus
real ICI wire time (~4 KB/row-halo, sub-microsecond — PERF.md 2-D
go/no-go section prices it) — the collective-path overhead measured
here is the dominant unknown, not the wire.

Run: python scripts/experiments/exp_sharded_overhead.py [--rng hw]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--backend", default="bit1")
    ap.add_argument("--rng", default="hw")
    args = ap.parse_args()

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from ising_tpu import SimConfig, get_backend
    from ising_tpu.lattice import init_store
    from ising_tpu.models import ising
    from ising_tpu.parallel import make_sharded_stepper

    N = args.size
    cfg = SimConfig(nrows=N, ncols=N, temp=1.5, backend=args.backend,
                    rng=args.rng, seed=20260819)
    be = get_backend(cfg)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    def bench(step_n, steps=args.steps, reps=5):
        b, w = init_store(cfg.seed, N, N, be.encode)
        b, w = step_n(b, w, thr, jnp.uint32(0), 4)
        sync((b, w))
        diffs = []
        s0 = 4
        for _ in range(reps):
            t0 = time.perf_counter()
            b, w = step_n(b, w, thr, jnp.uint32(s0), steps)
            sync((b, w))
            t1 = time.perf_counter() - t0
            s0 += steps
            t0 = time.perf_counter()
            b, w = step_n(b, w, thr, jnp.uint32(s0), 2 * steps)
            sync((b, w))
            diffs.append(time.perf_counter() - t0 - t1)
            s0 += 2 * steps
        pos = sorted(d for d in diffs if d > 0) or [max(diffs)]
        return pos[len(pos) // 2] / steps, (b, w)

    _, plain = make_sharded_stepper(cfg, be)
    _, coll = make_sharded_stepper(cfg, be, force_collectives=True)

    t_plain, st_p = bench(plain)
    t_coll, st_c = bench(coll)

    # Bit-identity of the two code paths on the same step sequence (the
    # counter contract makes sharding a layout choice, not a semantics
    # choice). hw mode draws differ by construction; skip there.
    if args.rng != "hw":
        bp, wp = st_p
        bc, wc = st_c
        same = (np.array_equal(np.asarray(jax.device_get(bp)),
                               np.asarray(jax.device_get(bc)))
                and np.array_equal(np.asarray(jax.device_get(wp)),
                                   np.asarray(jax.device_get(wc))))
        print(f"bit-identical across code paths: {same}")
        assert same

    r_p = N * N / t_plain / 1e9
    r_c = N * N / t_coll / 1e9
    print(f"{args.backend}/{args.rng} {N}^2:")
    print(f"  plain path      : {t_plain * 1e3:.3f} ms/step "
          f"({r_p:6.1f} flips/ns)")
    print(f"  collective path : {t_coll * 1e3:.3f} ms/step "
          f"({r_c:6.1f} flips/ns)")
    print(f"  overhead: {(t_coll / t_plain - 1) * 100:+.1f}% -> one-chip "
          f"efficiency bound {t_plain / t_coll * 100:.1f}%")


if __name__ == "__main__":
    sys.exit(main())
