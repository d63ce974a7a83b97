"""TPU timing of Swendsen-Wang updates (cluster.py) vs Metropolis sweeps.

Per-step wall time (marginal slope between step counts, scalar-fetch
fenced — block_until_ready is unreliable through the tunnel, CLAUDE.md)
and the label-propagation iteration count at equilibrium, at Tc and in
the ordered phase. The physics context: at Tc one SW update decorrelates
|m| in tau ~ 2.8 updates at L=64 while Metropolis needs tau ~ 167+ sweeps
(examples/cluster_vs_metropolis.py) — so SW wins end-to-end whenever
t_SW / t_sweep < tau_Met / tau_SW.

Run: python scripts/experiments/bench_cluster.py [--sizes 2048,4096]
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
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from ising_tpu import SimConfig
from ising_tpu.cluster import SwendsenWang, bond_threshold, open_bonds
from ising_tpu.constants import TCRIT
from ising_tpu.driver import Simulation
from ising_tpu.rng import TAG_CLUSTER, color_draws


def label_iters(open_r, open_d, scans=True, jumps=1):
    """label_clusters with an iteration counter (library twin)."""
    from ising_tpu.cluster import _seg_scan_axis
    Y, X = open_r.shape
    ids = jnp.arange(Y * X, dtype=jnp.int32).reshape(Y, X)

    def body(state):
        lab, _, k = state
        l_r = jnp.where(open_r, jnp.roll(lab, -1, axis=1), lab)
        l_l = jnp.where(jnp.roll(open_r, 1, axis=1),
                        jnp.roll(lab, 1, axis=1), lab)
        l_d = jnp.where(open_d, jnp.roll(lab, -1, axis=0), lab)
        l_u = jnp.where(jnp.roll(open_d, 1, axis=0),
                        jnp.roll(lab, 1, axis=0), lab)
        new = jnp.minimum(lab, jnp.minimum(jnp.minimum(l_r, l_l),
                                           jnp.minimum(l_d, l_u)))
        if scans:
            new = jnp.minimum(new, _seg_scan_axis(new, open_r, 1))
            new = jnp.minimum(new, _seg_scan_axis(new, open_d, 0))
        for _ in range(jumps):
            new = jnp.take(new.reshape(-1), new)
        return new, jnp.any(new != lab), k + 1

    _, _, k = lax.while_loop(lambda s: s[1], body,
                             (ids, jnp.asarray(True), jnp.int32(0)))
    return k


def fence(sw):
    # scalar fetch fences dispatch through the tunnel
    return int(jax.device_get(sw.full[0, 0]))


def time_steps(advance, fence_fn, n1=2, n2=8):
    """Marginal per-step seconds between two step counts: (t(n2) - t(n1))
    / (n2 - n1), so per-call dispatch overhead cancels (bench.py's
    discipline; state varies naturally between reps)."""
    advance(1)  # warm/compile
    fence_fn()
    t0 = time.time()
    advance(n1)
    fence_fn()
    t1 = time.time()
    advance(n2)
    fence_fn()
    t2 = time.time()
    return max(((t2 - t1) - (t1 - t0)) / (n2 - n1), 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096")
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    for L in sizes:
        for T in (TCRIT, 1.5):
            cfg = SimConfig(nrows=L, ncols=L, temp=float(T), seed=7,
                            backend="xla")
            sw = SwendsenWang(cfg)
            sw.advance(5)  # equilibrate a little / compile
            fence(sw)
            t_sw = time_steps(sw.advance, lambda: fence(sw))
            # label-loop contraction variants at the current state: the
            # library default (scan+jump) vs per-iteration-cheap options
            # — the right default depends on the target's gather/scan
            # costs, so measure here, then tune label_clusters' flags.
            thr = bond_threshold(cfg.temperature)
            dr = color_draws(cfg.seed, L, L, step=jnp.uint32(sw.step),
                             tag=TAG_CLUSTER | 0, row_stride=L)
            dd = color_draws(cfg.seed, L, L, step=jnp.uint32(sw.step),
                             tag=TAG_CLUSTER | 1, row_stride=L)
            o_r, o_d = open_bonds(sw.full, dr, dd, thr)
            variants = {}
            for name, kw in (("scan+jump", dict(scans=True, jumps=1)),
                             ("scan", dict(scans=True, jumps=0)),
                             ("stencil", dict(scans=False, jumps=0)),
                             ("jump", dict(scans=False, jumps=1))):
                f = jax.jit(lambda a, b, kw=kw: label_iters(a, b, **kw))
                k = int(jax.device_get(f(o_r, o_d)))  # warm + count
                t0 = time.time()
                for _ in range(3):
                    int(jax.device_get(f(o_r, o_d)))
                variants[name] = (k, (time.time() - t0) / 3)
            # Metropolis sweep time, same shape, flagship xla path
            met = Simulation(cfg)
            met.advance(2)
            jax.device_get(met.black[0, 0])
            t0 = time.time()
            met.advance(8)
            jax.device_get(met.black[0, 0])
            t_met = (time.time() - t0) / 8
            vtxt = "  ".join(f"{n}:{k}it/{t * 1e3:.0f}ms"
                             for n, (k, t) in variants.items())
            print(f"L={L} T={'Tc' if T == TCRIT else T}: "
                  f"SW {t_sw * 1e3:8.2f} ms/update, "
                  f"Metropolis {t_met * 1e3:8.2f} ms/sweep, "
                  f"ratio {t_sw / t_met:6.1f}x | label: {vtxt}",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
