"""Benchmark harness: prints ONE JSON line with flips/ns vs the baseline.

Baseline (BASELINE.md): the reference's optimized CUDA kernel sustains
~520 spin flips/ns per A100 chip. This harness times the flagship backend's
steady-state update loop on whatever device JAX provides (the real TPU chip
under the driver; CPU locally) and reports

    {"metric": "spin_flips_per_ns", "value": ..., "unit": "flips/ns",
     "vs_baseline": value / 520.7}

Protocol mirrors the reference's timing (optimized/main.cu:1758-1890): no
measurement traffic inside the timed region, fixed step count, flips =
nrows * ncols * steps.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import json
import sys
import time

BASELINE_FLIPS_NS = 520.7  # A100 per-chip, optimized/README.md:251


def pick_config(backend: str, platform: str):
    """Lattice sized for the platform: big enough to saturate, small enough
    to stay fast on CPU CI runs."""
    if platform == "cpu":
        return dict(nrows=1024, ncols=1024, steps=8, warm=2)
    if backend in ("packed", "bit1"):
        # 192 steps ~ 120 ms per timing window: large against the tunnel's
        # 30-70 ms dispatch/sync jitter, so the median slope is tight.
        return dict(nrows=16384, ncols=16384, steps=192, warm=8)
    if backend in ("dense", "mxu"):
        return dict(nrows=8192, ncols=8192, steps=64, warm=4)
    return dict(nrows=4096, ncols=4096, steps=16, warm=2)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="override flagship backend")
    ap.add_argument("--rng", default="hw",
                    choices=("philox", "philox7", "philox7b", "threefry",
                             "threefry13", "threefry13b", "hw"))
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--cols", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--j", type=float, default=None,
                    help="quenched disorder J probability")
    ap.add_argument("--ndev", type=int, default=1,
                    help="shard over an n-device mesh (weak-scaling bench; "
                         "needs n visible devices)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from ising_tpu import SimConfig, get_backend
    from ising_tpu.lattice import init_store
    from ising_tpu.models import ising
    from ising_tpu.parallel import make_sharded_stepper

    platform = jax.devices()[0].platform
    if args.backend is None:
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", __file__.replace("bench.py", "__graft_entry__.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        backend = mod.FLAGSHIP_BACKEND
    else:
        backend = args.backend

    p = pick_config(backend, platform)
    nrows = args.rows or p["nrows"]
    ncols = args.cols or p["cols" if "cols" in p else "ncols"]
    steps = args.steps or p["steps"]
    warm = p["warm"]

    if args.ndev > len(jax.devices()):
        print(json.dumps({"error": f"--ndev {args.ndev} but only "
                          f"{len(jax.devices())} devices visible"}))
        return 1
    cfg = SimConfig(nrows=nrows, ncols=ncols, temp=1.5, backend=backend,
                    rng=args.rng, ndev=args.ndev, j_prob=args.j)
    be = get_backend(cfg)
    b, w = init_store(cfg.seed, cfg.nrows, cfg.ncols, be.encode)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    jplanes = None
    if args.j is not None:
        from ising_tpu.driver import build_disorder
        _, _, jplanes = build_disorder(cfg, be)
    shardings, step_n = make_sharded_stepper(cfg, be, jplanes=jplanes)
    if shardings["plane"] is not None:
        b = jax.device_put(b, shardings["plane"])
        w = jax.device_put(w, shardings["plane"])

    def sync(x):
        # On the axon tunnel block_until_ready can return before remote
        # execution finishes; a host readback is the only reliable fence.
        jax.block_until_ready(x)
        import numpy as np
        np.asarray(jax.device_get(x[0][:1, :4]))

    # warmup: compile + settle
    b, w = step_n(b, w, thr, jnp.uint32(0), warm)
    sync((b, w))

    # Two step counts; the marginal slope removes fixed dispatch/sync
    # overhead (~30-70 ms through the tunnel). Median of 5 pairs; if the
    # tunnel is in a degraded window (slope spread comparable to the
    # median, or mostly non-positive slopes), double the step window and
    # re-measure — larger windows push the signal back above the jitter.
    def measure(nsteps, base):
        nonlocal b, w
        out = []
        s0 = base
        for _ in range(5):
            t0 = time.perf_counter()
            b, w = step_n(b, w, thr, jnp.uint32(s0), nsteps)
            sync((b, w))
            t_small = time.perf_counter() - t0
            s0 += nsteps
            t0 = time.perf_counter()
            b, w = step_n(b, w, thr, jnp.uint32(s0), 2 * nsteps)
            sync((b, w))
            t_large = time.perf_counter() - t0
            s0 += 2 * nsteps
            out.append(t_large - t_small)
        return out, s0

    base = warm
    for attempt in range(2):
        diffs, base = measure(steps, base)
        positive = sorted(d for d in diffs if d > 0)
        if len(positive) >= 4:
            med = positive[len(positive) // 2]
            spread = positive[-1] - positive[0]
            if spread < 1.5 * med:
                break
        steps *= 2  # noisy window: double the signal

    # Tunnel noise can inflate either measurement of a pair, so neither
    # min nor mean is safe (min once reported an impossible >HBM-limit
    # number when a stall inflated t_small). Median of positives is
    # robust; a physical sanity floor rejects beyond-roofline estimates.
    positive = sorted(d for d in diffs if d > 0) or [max(diffs)]
    elapsed = positive[len(positive) // 2]
    # Physical sanity floor: per-step lattice traffic is 3 x bytes_per_spin
    # (read src + read dst + write dst per color phase) at ~820 GB/s peak
    # HBM on v5e. If tunnel noise ever produces a beyond-roofline estimate,
    # clamp it and SAY SO in the JSON instead of reporting it silently.
    bps = getattr(be, "bytes_per_spin", 1.0)
    floor = cfg.nspins * steps * 3.0 * bps / 850e9 \
        if platform == "tpu" else 0.0
    clamped = elapsed < floor
    elapsed = max(elapsed, floor, 1e-9)
    flips = cfg.nspins * steps
    flips_ns = flips / (elapsed * 1e9)
    detail = {"backend": backend, "rng": args.rng, "platform": platform,
              "lattice": f"{nrows}x{ncols}", "steps": steps,
              "elapsed_s": round(elapsed, 4)}
    if args.ndev > 1:
        detail["ndev"] = args.ndev
    if args.j is not None:
        detail["j_prob"] = args.j
    if clamped:
        detail["clamped"] = True
    print(json.dumps({
        "metric": "spin_flips_per_ns",
        "value": round(flips_ns, 3),
        "unit": "flips/ns",
        "vs_baseline": round(flips_ns / BASELINE_FLIPS_NS, 4),
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
