"""Disordered bit1 at reference scale on one chip, energy WITHOUT decode.

VERDICT r2 gap #3/#5: disordered sweeps ran at 8.6 G spins but the energy
measurement still decoded to byte planes. With the parity-split packed link
store (driver.build_disorder) and the word-domain disordered energy block
(observables._bit1_energy_block_dis), the full disordered pipeline —
sweeps + magnetization + energy — now runs where decoded planes + links
would not fit. Reference analog: optimized/main.cu:870-1070 measures its
disordered energies in-place packed.

Run: python -u scripts/verify_disorder_scale.py [--rows N] [--cols N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=131072)
    ap.add_argument("--cols", type=int, default=65536)
    ap.add_argument("--j", type=float, default=0.3)
    ap.add_argument("--steps", type=int, default=4)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    from ising_tpu import SimConfig
    from ising_tpu.driver import Simulation

    cfg = SimConfig(nrows=args.rows, ncols=args.cols, temp=1.5,
                    backend="bit1", rng="hw", j_prob=args.j)
    print(f"shape {args.rows}x{args.cols} = {cfg.nspins / 1e9:.1f} G spins, "
          f"J={args.j}", flush=True)

    t0 = time.time()
    sim = Simulation(cfg)
    print(f"init (incl. chunked link build): {time.time() - t0:.1f} s",
          flush=True)

    t0 = time.time()
    sim.advance(args.steps)
    sim.block()
    dt = time.time() - t0
    print(f"{args.steps} disordered steps: {dt:.2f} s "
          f"({cfg.nspins * args.steps / dt / 1e9:.0f} flips/ns)", flush=True)

    t0 = time.time()
    m = sim.measure()
    print(f"magnetization: {m['magnetization']:.6f} "
          f"({time.time() - t0:.1f} s)", flush=True)

    t0 = time.time()
    e = sim.energy()
    print(f"energy/spin: {e:.6f} (word-domain disordered path, "
          f"{time.time() - t0:.1f} s)", flush=True)
    # sanity: at T=1.5 with J=0.3 the quenched frustration keeps |E| well
    # below the clean-lattice value; any decode-path OOM would have thrown.
    assert -2.0 <= e <= 0.0
    print("OK: disordered energy at scale without decode", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
