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
from ising_tpu.cluster import (SwendsenWang, bond_threshold,
                               label_clusters, label_clusters_tiled,
                               open_bonds)
from ising_tpu.constants import TCRIT
from ising_tpu.driver import Simulation
from ising_tpu.rng import TAG_CLUSTER, color_draws


def bond_state(cfg, L, step):
    """Open-bond planes for the given step of cfg's trajectory stream."""
    thr = bond_threshold(cfg.temperature)
    dr = color_draws(cfg.seed, L, L, step=jnp.uint32(step),
                     tag=TAG_CLUSTER | 0, row_stride=L)
    dd = color_draws(cfg.seed, L, L, step=jnp.uint32(step),
                     tag=TAG_CLUSTER | 1, row_stride=L)
    return dr, dd, thr


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


ALL_VARIANTS = (("scan+jump", dict(scans=True, jumps=1)),
                ("scan", dict(scans=True, jumps=0)),
                ("stencil", dict(scans=False, jumps=0)),
                ("jump", dict(scans=False, jumps=1)),
                ("tiled", None))  # Pallas VMEM labeler (own entry point)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096")
    ap.add_argument("--variants", default="stencil,tiled",
                    help="comma list from scan+jump,scan,stencil,jump,"
                         "tiled; 'all' for everything (beware: the scan "
                         "program's first compile takes ~20 min at "
                         "L>=2048 on TPU)")
    ap.add_argument("--temps", default="tc,1.5")
    ap.add_argument("--met-steps", type=int, default=64,
                    help="Metropolis marginal-slope base step count "
                         "(n1; n2 = 4*n1) — large enough to rise above "
                         "tunnel timing noise at small L")
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]
    pick = (None if args.variants in (None, "all")
            else args.variants.split(","))
    if pick:
        known = {name for name, _ in ALL_VARIANTS}
        bad = sorted(set(pick) - known)
        if bad:
            ap.error(f"unknown variant(s) {bad}; choose from "
                     f"{sorted(known)} or 'all'")
    temps = [TCRIT if t.strip() == "tc" else float(t)
             for t in args.temps.split(",")]

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    for L in sizes:
        for T in temps:
            cfg = SimConfig(nrows=L, ncols=L, temp=float(T), seed=7,
                            backend="xla")
            sw = SwendsenWang(cfg)
            sw.advance(5)  # equilibrate a little / compile
            fence(sw)
            t_sw = time_steps(sw.advance, lambda: fence(sw))
            # label-loop contraction variants (the library's own
            # label_clusters with return_iters — no duplicated twin): the
            # default (scan+jump) vs per-iteration-cheap options. The
            # right default depends on the target's gather/scan costs, so
            # measure here, then tune label_clusters' flags. Inputs VARY
            # between reps (three distinct bond realizations from
            # consecutive draw steps of the equilibrated state) per the
            # benching discipline in CLAUDE.md.
            states = []
            for ds in range(3):
                dr, dd, thr = bond_state(cfg, L, sw.step + ds)
                states.append(open_bonds(sw.full, dr, dd, thr))
            variants = {}
            for name, kw in ALL_VARIANTS:
                if pick and name not in pick:
                    continue
                if kw is None:
                    f = jax.jit(lambda a, b: label_clusters_tiled(
                        a, b, return_iters=True))
                else:
                    f = jax.jit(lambda a, b, kw=kw: label_clusters(
                        a, b, return_iters=True, **kw))
                k = int(jax.device_get(f(*states[0])[1]))  # warm + count
                t0 = time.time()
                for st in states:
                    int(jax.device_get(f(*st)[1]))
                variants[name] = (k, (time.time() - t0) / len(states))
            # Metropolis sweep time, same shape, flagship xla path —
            # the same marginal-slope discipline as t_sw
            met = Simulation(cfg)
            t_met = time_steps(met.advance,
                               lambda: int(jax.device_get(
                                   met.black[0, 0])),
                               n1=args.met_steps, n2=4 * args.met_steps)
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
