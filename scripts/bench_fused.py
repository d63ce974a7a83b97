"""TPU A/B bench: two-call path vs fused kernels (v1 auto, v2 manual DMA).

Run on the TPU host, one process at a time:

    python -u scripts/bench_fused.py [--size 16384] [--rng hw]

Protocol per PERF.md: warmup, then time the marginal slope between N and 2N
steps, fencing with a small device_get readback (block_until_ready does not
reliably block through the axon tunnel); median of `--reps`.
Before timing, verifies fused outputs == two-call outputs on-chip at the
full benchmark shape (bit-exactness gate after any kernel change).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16384)
    ap.add_argument("--rng", default="hw")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--by", type=int, nargs="*", default=[256, 512])
    ap.add_argument("--skip-v1", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from ising_tpu import SimConfig, get_backend, lattice
    from ising_tpu.constants import BLACK, WHITE
    from ising_tpu.models import ising
    from ising_tpu.ops.pallas_packed import (packed_fused_step,
                                             packed_fused_step_manual)

    N = args.size
    cfg = SimConfig(nrows=N, ncols=N, temp=1.5, backend="packed",
                    rng=args.rng)
    be = get_backend(cfg)
    b0, w0 = be.encode(*lattice.init_bits(cfg.seed, N, N))
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    nspins = cfg.nspins

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[0][:1, :4]))

    def two_call(b, w, step):
        nb = be.update_color(b, w, color=BLACK, thr10=thr, step=step,
                             src_up=w[-1:], src_dn=w[:1])
        nw = be.update_color(w, nb, color=WHITE, thr10=thr, step=step,
                             src_up=nb[-1:], src_dn=nb[:1])
        return nb, nw

    def make_loop(stepper):
        @jax.jit
        def loop(b, w, step0, n):
            def body(i, bw):
                return stepper(bw[0], bw[1], step0 + i.astype(jnp.uint32))
            return jax.lax.fori_loop(0, n, body, (b, w))
        return loop

    variants = {"two-call": make_loop(two_call)}
    if not args.skip_v1:
        variants["fused-v1"] = make_loop(
            lambda b, w, s: packed_fused_step(
                b, w, thr, jnp.uint32(0), s, seed=cfg.seed,
                rng_mode=cfg.rng, interpret=False, greedy=False))
    for by in args.by:
        if N % by:
            continue
        variants[f"fused-v2-by{by}"] = make_loop(
            lambda b, w, s, by=by: packed_fused_step_manual(
                b, w, thr, jnp.uint32(0), s, seed=cfg.seed,
                rng_mode=cfg.rng, interpret=False, greedy=False,
                block_rows=by))

    # ---- bit-exactness gate: every variant == two-call after 3 steps.
    print(f"bench_fused: {N}x{N} rng={args.rng} "
          f"(platform={jax.devices()[0].platform})", flush=True)
    ref = None
    for name, loop in variants.items():
        t0 = time.time()
        b, w = loop(b0, w0, jnp.uint32(0), 3)
        sync((b, w))
        bh, wh = np.asarray(jax.device_get(b)), np.asarray(jax.device_get(w))
        if ref is None:
            ref = (bh, wh)
            status = "ref"
        else:
            d = int((ref[0] != bh).sum() + (ref[1] != wh).sum())
            status = "bit-exact" if d == 0 else f"DIFFERS ({d} words)"
            if d and args.rng != "hw":
                print(f"  {name}: {status} — ABORT", flush=True)
                return 1
            if d and args.rng == "hw":
                # hw mode draws differ between fused/unfused grids by
                # design (per-block seeding); no bit contract to check.
                status = "n/a (hw rng, no contract)"
        print(f"  compile+check {name}: {status} ({time.time()-t0:.0f}s)",
              flush=True)

    # ---- timing.
    for name, loop in variants.items():
        b, w = loop(b0, w0, jnp.uint32(0), 4)  # settle
        sync((b, w))
        diffs = []
        for r in range(args.reps):
            t0 = time.perf_counter()
            b, w = loop(b, w, jnp.uint32(100 + r), args.steps)
            sync((b, w))
            t_small = time.perf_counter() - t0
            t0 = time.perf_counter()
            b, w = loop(b, w, jnp.uint32(200 + r), 2 * args.steps)
            sync((b, w))
            diffs.append(time.perf_counter() - t0 - t_small)
        pos = sorted(d for d in diffs if d > 0) or [max(diffs)]
        med = pos[len(pos) // 2]
        best = pos[0]
        fl_med = nspins * args.steps / (med * 1e9)
        fl_best = nspins * args.steps / (best * 1e9)
        print(f"  {name:16s}: median {fl_med:7.1f} flips/ns "
              f"({med/args.steps*1e3:.3f} ms/step), best {fl_best:7.1f}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
