"""TPU timing of parallel tempering rounds: batched vs sequential.

The round-3 verdict's done-criterion for device-resident PT: K=16 rungs
at 4096^2 on chip, per-round wall time ~= the round's device compute
(K x one rung's sweeps_per_swap sweeps) + ONE round trip, instead of the
sequential path's K dispatches + fetch. This script measures

  * t_rung   — one rung advancing sweeps_per_swap sweeps (scalar-fetch
    fenced; the device-compute floor is K x this),
  * t_batched — per-round wall time with batched=True (the shipped
    default: one dispatch + one fetch per round),
  * t_seq    — per-round wall time with batched=False (the pre-round-4
    comparison baseline: per-rung dispatches),

and replays both paths from identical seeds, asserting the measure()
records (exact integer Hamiltonians, up-counts) and swap outcomes
(acceptance counters, rung->replica permutation) agree exactly — the
on-chip twin of tests/test_tempering.py's CPU bit-equality test.

Timing discipline per CLAUDE.md: wall times come from advance_round(),
which ends in a device_get (the round's one fetch) — naturally fenced
through the tunnel; the single-rung floor is fenced with a 1-element
device_get. First-round compiles are excluded by a warmup round.

At the demo's 4096^2 size every swap proposal rejects — dbeta * dE
scales with N (adjacent-rung equilibrium energies differ by ~N C dT), so
nonzero exchange rates at N = 1.7e7 would need K ~ sqrt(N) rungs. That
is PT physics, not a bug: production PT runs glassy SMALL systems
(examples/spin_glass_pt.py). The accept path's dynamics are exercised
bit-exactly at small N by tests/test_tempering.py; this script's job is
the wall-time claim at the verdict's stated shape.

Run (TPU): python scripts/experiments/bench_pt.py
Smoke (CPU): python scripts/experiments/bench_pt.py --cpu --size 256 \
    --rungs 4 --rounds 3
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--rungs", type=int, default=16)
    ap.add_argument("--sweeps", type=int, default=4,
                    help="sweeps per swap round")
    ap.add_argument("--rounds", type=int, default=10,
                    help="timed rounds per path")
    ap.add_argument("--backend", default="packed")
    ap.add_argument("--rng", default="threefry13")
    ap.add_argument("--tmin", type=float, default=1.5)
    ap.add_argument("--tmax", type=float, default=3.5)
    ap.add_argument("--seed", type=int, default=463463564571)
    ap.add_argument("--cpu", action="store_true",
                    help="run the smoke-size version on CPU")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import numpy as np
    from ising_tpu import SimConfig
    from ising_tpu.driver import Simulation
    from ising_tpu.tempering import ParallelTempering

    K = args.rungs
    # Geometric ladder spanning the critical region.
    r = (args.tmax / args.tmin) ** (1.0 / (K - 1))
    temps = [args.tmin * r ** i for i in range(K)]
    cfg = SimConfig(nrows=args.size, ncols=args.size, temp=temps[0],
                    seed=args.seed, backend=args.backend, rng=args.rng)
    n_per_round = K * args.sweeps * cfg.nspins

    # --- device-compute floor: one rung, sweeps_per_swap sweeps ---
    sim = Simulation(cfg)
    sim.advance(args.sweeps)                      # compile + settle
    _ = jax.device_get(sim.black[:1, :1])
    reps = max(3, args.rounds)
    t0 = time.perf_counter()
    for _ in range(reps):
        sim.advance(args.sweeps)
        _ = jax.device_get(sim.black[:1, :1])     # fence
    t_rung = (time.perf_counter() - t0) / reps
    print(f"one rung, {args.sweeps} sweeps @ {args.size}^2 "
          f"({args.backend}/{args.rng}): {t_rung * 1e3:8.2f} ms  "
          f"(device floor for a K={K} round: {K * t_rung * 1e3:.2f} ms)")

    def timed_path(batched):
        pt = ParallelTempering(cfg, temps, sweeps_per_swap=args.sweeps,
                               batched=batched)
        pt.advance_round()                        # compile warmup
        t0 = time.perf_counter()
        for _ in range(args.rounds):
            pt.advance_round()
        dt = (time.perf_counter() - t0) / args.rounds
        return pt, dt

    pt_b, t_batched = timed_path(True)
    pt_s, t_seq = timed_path(False)

    fns_b = n_per_round / (t_batched * 1e9)
    print(f"batched round    (1 dispatch + 1 fetch): {t_batched * 1e3:8.2f}"
          f" ms/round  ({fns_b:6.1f} flips/ns; "
          f"{t_batched / (K * t_rung):4.2f}x the device floor)")
    print(f"sequential round ({K} rung dispatches):  {t_seq * 1e3:8.2f}"
          f" ms/round  ({t_seq / t_batched:4.2f}x batched)")

    # --- bit-equality of the two paths over the run just timed ---
    mb, ms = pt_b.measure(), pt_s.measure()
    same_h = all(a["hamiltonian"] == b["hamiltonian"]
                 for a, b in zip(mb, ms))
    same_u = all(a["up"] == b["up"] for a, b in zip(mb, ms))
    same_swaps = (pt_b.accepts == pt_s.accepts
                  and pt_b.replica_at == pt_s.replica_at)
    print(f"bit-equality batched vs sequential after "
          f"{pt_b.round} rounds: hamiltonians "
          f"{'EQUAL' if same_h else 'DIFFER'}, up-counts "
          f"{'EQUAL' if same_u else 'DIFFER'}, swap records "
          f"{'EQUAL' if same_swaps else 'DIFFER'}")
    cold = min(range(K), key=lambda i: temps[i])
    print(f"cold rung T={temps[cold]:.3f}: E/N = {mb[cold]['energy']:+.4f} "
          f" |m| = {mb[cold]['magnetization']:.4f}  "
          f"pair acceptance {['%.2f' % (a / max(n, 1)) for a, n in zip(pt_b.accepts, pt_b.attempts)]}")
    if not (same_h and same_u and same_swaps):
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
