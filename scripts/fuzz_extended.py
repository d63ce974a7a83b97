"""Extended randomized cross-backend parity fuzz (CPU, minutes-long).

The committed fuzz tests (tests/test_fuzz.py) run 20 random cases in the
suite; this driver runs hundreds with a fresh master seed per invocation
argument, over MORE rng modes (incl. the battery-qualified chacha6[b]/
chacha4[b] tiers), as standalone robustness evidence. Any failure prints
the exact SimConfig kwargs + rng, so it is reproducible by construction.

Run: python scripts/fuzz_extended.py [--n 200] [--seed 20260818]
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200,
                    help="packed-vs-xla cases (bit1 runs n//2)")
    ap.add_argument("--seed", type=int, default=20260818)
    args = ap.parse_args(argv)

    from ising_tpu import SimConfig
    from ising_tpu.driver import Simulation
    from test_fuzz import bit1_cases, random_cases

    t0 = time.time()
    fails = 0

    def run_pair(backend, kw, rng):
        nonlocal fails
        s_x = Simulation(SimConfig(backend="xla", rng=rng, **kw))
        s_o = Simulation(SimConfig(backend=backend, rng=rng, **kw))
        s_x.advance(3)
        s_o.advance(3)
        bx, wx = s_x.bits()
        bo, wo = s_o.bits()
        ok = (np.array_equal(np.asarray(bx), np.asarray(bo))
              and np.array_equal(np.asarray(wx), np.asarray(wo)))
        if not ok:
            fails += 1
            print(f"FAIL {backend} {kw} rng={rng}", flush=True)
        return ok

    # u32-contract modes incl. the qualified reduced-round tiers; chacha
    # needs compact width % 16 (ncols % 32) so fall back when illegal.
    u32 = ["philox", "threefry", "philox7", "threefry13",
           "chacha8", "chacha6", "chacha4"]
    for i, kw in enumerate(random_cases(args.n, master_seed=args.seed)):
        rng = u32[kw["seed"] % len(u32)]
        if rng.startswith("chacha") and kw["ncols"] % 32 != 0:
            rng = "threefry13"
        run_pair("packed", kw, rng)
        if (i + 1) % 25 == 0:
            print(f"packed: {i + 1}/{args.n} done "
                  f"({fails} failures, {time.time() - t0:.0f} s)",
                  flush=True)

    planes = ["philox", "threefry13", "philox7b", "threefry13b",
              "chacha8b", "chacha6b", "chacha4b"]
    planes_only = ["philox7b", "threefry13b", "chacha8b", "chacha6b",
                   "chacha4b"]
    nb = args.n // 2
    for i, kw in enumerate(bit1_cases(nb, master_seed=args.seed + 1)):
        if "field" in kw:
            # bit1 field = 10-class bit-serial accept: plane modes only
            rng = planes_only[kw["seed"] % len(planes_only)]
        else:
            rng = planes[kw["seed"] % len(planes)]
        run_pair("bit1", kw, rng)
        if (i + 1) % 25 == 0:
            print(f"bit1: {i + 1}/{nb} done "
                  f"({fails} failures, {time.time() - t0:.0f} s)",
                  flush=True)

    n_total = args.n + nb
    print(f"fuzz_extended: {n_total} cases, {fails} failures, "
          f"{time.time() - t0:.0f} s (seed {args.seed})", flush=True)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
