"""Giant-lattice checkpoint/resume validation on the real TPU.

Exercises the streamed checkpoint at the advertised single-chip flagship
shape (524288 x 65536 = 34.4 G spins, bit1 backend): the decoded uint8
planes would be 34 GB on the host (plus packbits transients, ~70+ GB in
flight on the pre-v2 path); the streamed v2 path holds one 8192-row chunk
(~0.5 GB) at a time and writes a 4.3 GB file.

Protocol (reproducible threefry13 mode, so equality is the real contract):
  s1: advance 6 steps straight.
  s2: advance 3, checkpoint, free.
  s3: resume from the file, advance 3 more.
  assert s1 and s3 storage planes are bit-identical ON DEVICE.

Run:  python -u scripts/verify_ckpt_scale.py [--rows N] [--cols N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=524288)
    ap.add_argument("--cols", type=int, default=65536)
    ap.add_argument("--path", default="/tmp/ising_ckpt_scale.bin")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp
    from ising_tpu import SimConfig
    from ising_tpu.driver import Simulation

    cfg = SimConfig(nrows=args.rows, ncols=args.cols, temp=1.5,
                    backend="bit1", rng="threefry13")
    gspins = cfg.nspins / 1e9
    print(f"shape {args.rows}x{args.cols} = {gspins:.1f} G spins, "
          f"decoded planes would be {cfg.nspins / 2**30:.1f} GB on host",
          flush=True)

    t0 = time.time()
    s1 = Simulation(cfg)
    s1.advance(6)
    s1.block()
    print(f"s1: init + 6 steps in {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    s2 = Simulation(cfg)
    s2.advance(3)
    s2.block()
    print(f"s2: init + 3 steps in {time.time() - t0:.1f} s", flush=True)

    t0 = time.time()
    s2.checkpoint(args.path)
    sz = os.path.getsize(args.path)
    print(f"checkpoint: {sz / 2**30:.2f} GB written in "
          f"{time.time() - t0:.1f} s", flush=True)
    del s2  # free HBM before the resume copy loads

    t0 = time.time()
    s3 = Simulation.from_checkpoint(args.path)
    assert s3.step == 3
    s3.advance(3)
    s3.block()
    print(f"resume + 3 steps in {time.time() - t0:.1f} s", flush=True)

    okb = bool(jnp.array_equal(s1.black, s3.black))
    okw = bool(jnp.array_equal(s1.white, s3.white))
    print(f"black equal: {okb}, white equal: {okw}", flush=True)
    os.remove(args.path)
    if not (okb and okw):
        print("FAIL: resumed trajectory diverged", flush=True)
        return 1
    print("OK: exact continuation through a streamed checkpoint at "
          f"{gspins:.1f} G spins", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
