"""Run the reference's 8xA100 flagship problem on ONE TPU chip.

The reference's largest published run is 524288 x 65536 spins on 8 A100s
(optimized/README.md:318, 4136 flips/ns total). The bit1 tier's 1-bit
storage (8.6 GB for 34.4G spins), row-chunked initialization, and
word-domain observables put the whole problem — stepping, magnetization,
energy, and the 128-offset correlation — on a single chip:

    python examples/giant_lattice.py                # full 34.4G-spin shape
    python examples/giant_lattice.py --rows 65536   # one-GPU-sized (4.3G)

Measured on one v5e: 877 flips/ns sustained; measure+energy+corr128 in
~27 s (RESULTS.md).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=524288)
    ap.add_argument("--cols", type=int, default=65536)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--temp", type=float, default=1.5)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from ising_tpu import SimConfig, get_backend, lattice
    from ising_tpu.models import ising
    from ising_tpu.parallel import make_sharded_stepper

    cfg = SimConfig(nrows=args.rows, ncols=args.cols, temp=args.temp,
                    backend="bit1", rng="hw")
    be = get_backend(cfg)
    print(f"{cfg.nspins/1e9:.1f}G spins at "
          f"{cfg.nspins/8/2**30:.1f} GiB of storage", flush=True)

    t0 = time.time()
    b, w = lattice.init_store(cfg.seed, cfg.nrows, cfg.ncols, be.encode)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    _, step_n = make_sharded_stepper(cfg, be)
    b, w = step_n(b, w, thr, jnp.uint32(0), 1)
    jax.block_until_ready((b, w))
    print(f"init + compile: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    b, w = step_n(b, w, thr, jnp.uint32(1), args.steps)
    jax.block_until_ready((b, w))
    np.asarray(jax.device_get(b[:1, :4]))  # tunnel-safe fence
    dt = time.time() - t0
    print(f"{args.steps} steps: {dt:.2f}s wall incl. remote dispatch "
          f"(calibrated flips/ns: `python bench.py --rows {args.rows} "
          f"--cols {args.cols}`)", flush=True)

    t0 = time.time()
    n_up = int(np.asarray(jax.device_get(be.row_up_counts(b, w)),
                          np.int64).sum())
    e = -float(np.asarray(jax.device_get(be.energy_rows(b, w)),
                          np.int64).sum()) / cfg.nspins
    c = np.asarray(jax.device_get(be.corr_rows(b, w, 128)),
                   np.int64).sum(axis=1) / (2.0 * cfg.nspins)
    print(f"|m| = {abs(2*n_up-cfg.nspins)/cfg.nspins:.6f}  "
          f"E/N = {e:.6f}  corr[1] = {c[0]:.5f}  corr[128] = {c[127]:.6f}  "
          f"(measure+energy+corr128: {time.time()-t0:.1f}s)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
