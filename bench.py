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

Robustness contract (the driver runs this under an external timeout, through
a tunnel whose first compiles can take 100-850 s in degraded windows):
  - a persistent JAX compilation cache (.jax_cache/) makes repeat runs skip
    the remote compile entirely;
  - every timed pair yields its own rate = flips_actually_timed / elapsed,
    so no retry/doubling logic can ever mis-scale the reported number;
  - a wall-clock self-deadline emits a best-effort JSON line (flagged
    "degraded") instead of dying silently, and SIGTERM does the same.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

import argparse
import json
import signal
import sys
import time

BASELINE_FLIPS_NS = 520.7  # A100 per-chip, optimized/README.md:251

_T0 = time.monotonic()


def pick_config(backend: str, platform: str):
    """Lattice sized for the platform: big enough to saturate, small enough
    to stay fast on CPU CI runs."""
    if platform == "cpu":
        return dict(nrows=1024, ncols=1024, steps=8, warm=2)
    if backend in ("packed", "bit1"):
        # 192 steps ~ 60-120 ms per timing window: large against the
        # tunnel's 30-70 ms dispatch/sync jitter, so pair slopes are tight.
        return dict(nrows=16384, ncols=16384, steps=192, warm=8)
    if backend in ("dense", "mxu"):
        return dict(nrows=8192, ncols=8192, steps=64, warm=4)
    return dict(nrows=4096, ncols=4096, steps=16, warm=2)


class _Emitter:
    """Owns the single JSON output line. emit() is idempotent, so the
    normal path, the deadline path, and the SIGTERM path can all call it."""

    def __init__(self, detail, nspins, rate_cap):
        self.detail = detail
        self.nspins = nspins
        self.rate_cap = rate_cap  # flips/ns roofline; None = no cap
        self.rates = []           # flips/ns, one per successfully timed pair
        self.done = False

    def add_pair(self, nsteps, elapsed):
        if elapsed <= 0:
            return
        rate = self.nspins * nsteps / (elapsed * 1e9)
        if self.rate_cap is not None and rate > self.rate_cap:
            # Beyond-roofline estimate: tunnel noise deflated the timing.
            # Record the cap and say so rather than report the impossible.
            self.detail["clamped"] = True
            rate = self.rate_cap
        self.rates.append(rate)

    def emit(self, degraded=False):
        if self.done:
            return
        self.done = True
        rates = sorted(self.rates)
        if rates:
            value = rates[len(rates) // 2]
        else:
            value = 0.0
            degraded = True
        d = dict(self.detail)
        d["pairs"] = len(rates)
        d["wall_s"] = round(time.monotonic() - _T0, 1)
        if degraded:
            d["degraded"] = True
        print(json.dumps({
            "metric": "spin_flips_per_ns",
            "value": round(value, 3),
            "unit": "flips/ns",
            "vs_baseline": round(value / BASELINE_FLIPS_NS, 4),
            "detail": d,
        }), flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default=None,
                    help="override flagship backend")
    ap.add_argument("--rng", default="hw",
                    choices=("philox", "philox7", "philox7b", "threefry",
                             "threefry13", "threefry13b", "chacha8",
                             "chacha8b", "chacha6", "chacha6b", "chacha4",
                             "chacha4b", "hw"))
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--cols", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--j", type=float, default=None,
                    help="quenched disorder J probability")
    ap.add_argument("--ndev", type=int, default=1,
                    help="shard over an n-device mesh (weak-scaling bench; "
                         "needs n visible devices)")
    ap.add_argument("--budget", type=float, default=420.0,
                    help="wall-clock self-deadline (s); emits a best-effort "
                         "JSON line when it expires")
    ap.add_argument("--pairs", type=int, default=5,
                    help="target number of timed pairs")
    args = ap.parse_args(argv)

    # Persistent compilation cache: repeat runs of the same program skip the
    # remote compile service entirely (first compiles through a degraded
    # tunnel can take 100-850 s; cached loads are sub-second).
    cache_dir = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), ".jax_cache")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax: cache flags absent; proceed uncached

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
    ncols = args.cols or p["ncols"]
    steps = args.steps or p["steps"]
    warm = p["warm"]

    if args.ndev > len(jax.devices()):
        print(json.dumps({"error": f"--ndev {args.ndev} but only "
                          f"{len(jax.devices())} devices visible"}))
        return 1
    cfg = SimConfig(nrows=nrows, ncols=ncols, temp=1.5, backend=backend,
                    rng=args.rng, ndev=args.ndev, j_prob=args.j)
    be = get_backend(cfg)

    # Physical sanity cap: per-step lattice traffic is >= 3 x bytes_per_spin
    # (read src + read dst + write dst per color phase) at ~820 GB/s peak
    # HBM on v5e — a rate above 850/(3*bps) flips/ns is impossible PER
    # CHIP; the aggregate rate of an ndev-chip mesh scales the ceiling.
    bps = getattr(be, "bytes_per_spin", 1.0)
    rate_cap = args.ndev * 850.0 / (3.0 * bps) if platform != "cpu" else None

    detail = {"backend": backend, "rng": args.rng, "platform": platform,
              "lattice": f"{nrows}x{ncols}", "steps": steps}
    if args.ndev > 1:
        detail["ndev"] = args.ndev
    if args.j is not None:
        detail["j_prob"] = args.j
    em = _Emitter(detail, cfg.nspins, rate_cap)

    def on_term(signum, frame):
        em.emit(degraded=True)
        _os._exit(0)
    signal.signal(signal.SIGTERM, on_term)

    deadline = _T0 + args.budget

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

    # warmup: compile + settle (this is where a degraded-tunnel first
    # compile spends its 100-850 s; the persistent cache amortizes it).
    b, w = step_n(b, w, thr, jnp.uint32(0), warm)
    sync((b, w))
    detail["compile_s"] = round(time.monotonic() - _T0, 1)

    # Timing: pairs of (nsteps, 2*nsteps) windows; the marginal slope
    # (t_large - t_small) removes fixed dispatch/sync overhead (~30-70 ms
    # through the tunnel). Each pair contributes its OWN rate computed from
    # the steps it actually timed, so window-size adaptation can never
    # mis-scale the result. Median of pair rates is the reported value.
    s0 = warm
    cur = steps
    attempts = 0
    max_attempts = 4 * args.pairs
    while len(em.rates) < args.pairs and attempts < max_attempts:
        # Self-deadline only once at least one pair exists: a JSON line with
        # one real rate beats a punctual line with none. A truly wedged run
        # is bounded by the driver's external timeout, whose SIGTERM still
        # gets a best-effort line from the handler above.
        if em.rates and time.monotonic() > deadline:
            em.emit(degraded=True)
            return 0
        attempts += 1
        detail["steps"] = cur
        t0 = time.perf_counter()
        b, w = step_n(b, w, thr, jnp.uint32(s0), cur)
        sync((b, w))
        t_small = time.perf_counter() - t0
        s0 += cur
        t0 = time.perf_counter()
        b, w = step_n(b, w, thr, jnp.uint32(s0), 2 * cur)
        sync((b, w))
        t_large = time.perf_counter() - t0
        s0 += 2 * cur
        em.add_pair(cur, t_large - t_small)
        # Degraded window (non-positive slope): double the window so the
        # signal rises above the jitter. Only future pairs use the larger
        # window; already-recorded rates remain exact.
        if t_large - t_small <= 0:
            cur = min(2 * cur, 16 * steps)
    em.emit(degraded=len(em.rates) < min(3, args.pairs))
    return 0


if __name__ == "__main__":
    sys.exit(main())
