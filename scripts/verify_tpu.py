"""Compiled-TPU vs CPU ground-truth bit-exactness verification.

Mosaic/v5e was observed to silently miscompile the packed kernel at
sub-128-lane plane widths (one 4-bit field's accept bits dropped — see
PERF.md and CLAUDE.md): micro-isolation of individual ops could NOT
reproduce it, so the only reliable regression gate is a full-kernel
bit-compare of the compiled TPU trajectory against the CPU ground truth.
Round 1 ran this protocol by hand; this script is the button.

Run it on the machine with the TPU attached (ONE TPU process at a time):

    python scripts/verify_tpu.py            # 2048/4096-wide suite, ~2 min
    python scripts/verify_tpu.py --big      # adds the 16384^2 bench shape

Ground truth is the pure-XLA backend executed on the host CPU *in the same
process* (the CPU backend is always available next to the TPU one), using
the bit-reproducible counter RNG contract shared by all backends.
Exit code 0 = every case bit-exact.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_case(jax, jnp, *, nrows, ncols, rng, steps, backend="packed",
             j_prob=None, xsl=None, ysl=None, split=False, field=0.0):
    from ising_tpu import SimConfig, get_backend, lattice
    from ising_tpu.constants import BLACK, WHITE
    from ising_tpu.models import ising

    kw = dict(nrows=nrows, ncols=ncols, temp=1.8, seed=20260816, rng=rng,
              j_prob=j_prob, xsl=xsl, ysl=ysl, field=field)
    thr_np = ising.threshold_table(SimConfig(**kw).temperature, field)

    def trajectory(cfg, device):
        be = get_backend(cfg)
        b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
        jb = jw = None
        if cfg.j_prob is not None and split:
            # the driver path: parity-split link store, in-kernel
            # projection on capable backends (bit1 single-device)
            from ising_tpu.driver import build_disorder
            _, _, (jb, jw) = build_disorder(cfg, be)
            jb = jax.device_put(jb, device)
            jw = jax.device_put(jw, device)
        elif cfg.j_prob is not None:
            v, h = ising.generate_disorder_links(cfg.seed, cfg.nrows,
                                                 cfg.ncols, cfg.j_prob)
            enc = getattr(be, "encode_jplanes", lambda p: p)
            jb = tuple(enc(lattice.links_to_color_planes(v, h, BLACK)))
            jw = tuple(enc(lattice.links_to_color_planes(v, h, WHITE)))
            jb = jax.device_put(jb, device)
            jw = jax.device_put(jw, device)
        b, w = be.encode(b, w)
        b = jax.device_put(b, device)
        w = jax.device_put(w, device)
        thr = jax.device_put(jnp.asarray(thr_np), device)
        for step in range(steps):
            b = be.update_color(b, w, color=BLACK, thr10=thr,
                                step=jnp.uint32(step), src_up=w[-1:],
                                src_dn=w[:1], jplanes=jb)
            w = be.update_color(w, b, color=WHITE, thr10=thr,
                                step=jnp.uint32(step), src_up=b[-1:],
                                src_dn=b[:1], jplanes=jw)
        db, dw = be.decode(b, w)
        return np.asarray(jax.device_get(db)), np.asarray(jax.device_get(dw))

    tpu_dev = jax.devices()[0]
    cpu_dev = jax.devices("cpu")[0]

    t0 = time.time()
    bt, wt = trajectory(SimConfig(backend=backend, **kw), tpu_dev)
    t_tpu = time.time() - t0
    t0 = time.time()
    bc, wc = trajectory(SimConfig(backend="xla", **kw), cpu_dev)
    t_cpu = time.time() - t0

    diffs = int((bt != bc).sum() + (wt != wc).sum())
    tag = f"{backend} {nrows}x{ncols} rng={rng}"
    if j_prob is not None:
        tag += f" J={j_prob}" + (" split" if split else "")
    if field:
        tag += f" h={field}"
    if xsl is not None:
        tag += f" repl={xsl}x{ysl}"
    status = "OK " if diffs == 0 else "FAIL"
    print(f"  [{status}] {tag}: {diffs} differing sites "
          f"(tpu {t_tpu:.1f}s, cpu ground truth {t_cpu:.1f}s)", flush=True)
    return diffs == 0


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--big", action="store_true",
                    help="also verify the 16384^2 benchmark shape")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--backend", default="packed",
                    choices=("packed", "dense", "bit1", "mxu", "xla"))
    args = ap.parse_args(argv)

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    import jax.numpy as jnp

    plat = jax.devices()[0].platform
    print(f"verify_tpu: compiled platform = {plat} "
          f"(ground truth = xla backend on cpu)", flush=True)
    if plat == "cpu":
        print("  WARNING: no accelerator found; this verifies the "
              "interpret path against itself and cannot catch Mosaic "
              "miscompiles.", flush=True)

    ok = True
    if args.backend == "bit1":
        # bit1 requires ncols % 8192 on compiled TPU (W1 = ncols/64 must
        # fill 128-lane registers); replica needs xsl/2 | W1.
        cases = [
            dict(nrows=64, ncols=8192, rng="philox"),
            dict(nrows=64, ncols=8192, rng="threefry13"),
            dict(nrows=64, ncols=16384, rng="philox7"),
            dict(nrows=64, ncols=16384, rng="threefry"),
            dict(nrows=64, ncols=8192, rng="chacha8"),
            # bit-plane contract modes (in-kernel bit-serial accept)
            dict(nrows=64, ncols=8192, rng="threefry13b"),
            dict(nrows=64, ncols=16384, rng="philox7b"),
            dict(nrows=64, ncols=16384, rng="chacha8b"),
            dict(nrows=64, ncols=8192, rng="chacha8b", j_prob=0.3),
            # qualified reduced-round tiers (docs/rng_battery/)
            dict(nrows=64, ncols=8192, rng="chacha6b"),
            dict(nrows=64, ncols=16384, rng="chacha4b"),
            dict(nrows=64, ncols=8192, rng="chacha4"),
            dict(nrows=64, ncols=16384, rng="chacha6"),
            # bit-sliced J-XOR disorder (classic per-color planes)
            dict(nrows=64, ncols=8192, rng="threefry13", j_prob=0.3),
            dict(nrows=64, ncols=8192, rng="philox7b", j_prob=0.3),
            # split-links store with in-kernel projection (driver path)
            dict(nrows=64, ncols=8192, rng="threefry13", j_prob=0.3,
                 split=True),
            # sub-lattice replica wrap (dual lane roll + edge-array rows)
            dict(nrows=64, ncols=8192, rng="philox", xsl=64, ysl=16),
            dict(nrows=64, ncols=8192, rng="threefry13b", xsl=64, ysl=16),
            # external field: the 10-class bit-serial accept (static
            # k-bit thresholds per (own bit, neighbor count) class)
            dict(nrows=64, ncols=8192, rng="threefry13b", field=0.75),
            dict(nrows=64, ncols=16384, rng="chacha8b", field=-1.25),
            dict(nrows=64, ncols=8192, rng="philox7b", field=0.75,
                 j_prob=0.3),
        ]
    elif args.backend == "xla":
        # Compiled-on-TPU xla backend vs the same backend on host CPU:
        # covers the external-field full-table select path (field is
        # xla-only; the Pallas gates cannot carry it).
        cases = [
            dict(nrows=64, ncols=2048, rng="threefry13", field=0.75),
            dict(nrows=64, ncols=2048, rng="chacha8", field=-1.25),
            dict(nrows=64, ncols=2048, rng="threefry13", field=0.75,
                 j_prob=0.3),
            # plane-mode field: the dense 10-class bit-serial accept
            dict(nrows=64, ncols=2048, rng="philox7b", field=0.75),
        ]
    else:
        # mxu needs nrows and ncols/2 to be multiples of 128.
        ny = 128 if args.backend == "mxu" else 64
        cases = [
            dict(nrows=ny, ncols=2048, rng="philox"),
            dict(nrows=ny, ncols=2048, rng="threefry13"),
            dict(nrows=ny, ncols=4096, rng="philox7"),
            dict(nrows=ny, ncols=4096, rng="threefry"),
            dict(nrows=ny, ncols=2048, rng="chacha8"),
        ]
        if args.backend == "packed":
            cases += [
                dict(nrows=64, ncols=2048, rng="threefry13", j_prob=0.3),
                dict(nrows=64, ncols=2048, rng="philox", xsl=256, ysl=16),
                # full-table accept (external field): 10-class select
                # chains per own-bit — new op composition, gate it
                dict(nrows=64, ncols=2048, rng="threefry13", field=0.75),
                dict(nrows=64, ncols=2048, rng="chacha8", field=-1.25,
                     j_prob=0.3),
            ]
        if args.backend == "dense":
            # dense indexes all 10 acceptance classes: field rides the
            # threshold table with no kernel change — gate it compiled.
            cases.append(dict(nrows=64, ncols=2048, rng="threefry13",
                              field=0.75))
    if args.big:
        cases.append(dict(nrows=16384, ncols=16384, rng="threefry13",
                          steps=2))
    for case in cases:
        steps = case.pop("steps", args.steps)
        ok &= run_case(jax, jnp, backend=args.backend, steps=steps, **case)

    print("verify_tpu: ALL BIT-EXACT" if ok else "verify_tpu: FAILURES",
          flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
