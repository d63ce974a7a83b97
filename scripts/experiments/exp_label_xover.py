"""Labeling-contraction crossover on the real TPU (round 5).

The first on-chip cluster numbers (bench_cluster.py, L=1024) inverted
the CPU tuning: at Tc the pure stencil labels in 51 ms where the
scan+jump default takes 2204 ms — segmented scans and pointer-jump
gathers cost ~150x a stencil iteration on this chip, swamping their
10x iteration-count advantage. This probe measures ONLY the labeling
(the dominant SW cost) at increasing L to locate the crossover that
sets sw_step's TPU contraction threshold.

Equilibration uses a handful of SW updates labeled with the stencil
variant (SW decorrelates in ~3 updates at any L, so this is cheap and
gives honest Tc-equilibrium cluster structure), then each variant is
timed on 3 distinct equilibrium bond realizations (inputs vary between
reps, CLAUDE.md benching discipline).

Run: python scripts/experiments/exp_label_xover.py [--sizes 1024,2048,4096]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from ising_tpu.cluster import (bond_threshold, cluster_coins,
                               label_clusters, open_bonds)
from ising_tpu.constants import TCRIT
from ising_tpu.lattice import compact_to_full, init_bits
from ising_tpu.rng import TAG_CLUSTER, color_draws


def bond_state(full, seed, L, step, thr):
    dr = color_draws(seed, L, L, step=jnp.uint32(step),
                     tag=TAG_CLUSTER | 0, row_stride=L)
    dd = color_draws(seed, L, L, step=jnp.uint32(step),
                     tag=TAG_CLUSTER | 1, row_stride=L)
    return open_bonds(full, dr, dd, thr)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048,4096")
    ap.add_argument("--equil", type=int, default=5)
    ap.add_argument("--variants", default="scan+jump,stencil")
    args = ap.parse_args(argv)
    named = {"scan+jump": dict(scans=True, jumps=1),
             "scan": dict(scans=True, jumps=0),
             "stencil": dict(scans=False, jumps=0),
             "jump": dict(scans=False, jumps=1)}
    pick = [(n, named[n]) for n in args.variants.split(",")]

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    seed = 7
    thr = bond_threshold(TCRIT)

    @jax.jit
    def sw_update_stencil(full, step):
        o_r, o_d = bond_state(full, seed, full.shape[0], step, thr)
        labels = label_clusters(o_r, o_d, scans=False, jumps=0)
        flip = cluster_coins(labels, seed, step)
        return full ^ flip

    for L in [int(s) for s in args.sizes.split(",")]:
        full = compact_to_full(*init_bits(seed, L, L))
        for k in range(args.equil):
            full = sw_update_stencil(full, jnp.uint32(k))
        int(jax.device_get(full[0, 0]))  # fence through the tunnel
        states = [bond_state(full, seed, L, args.equil + 1 + ds, thr)
                  for ds in range(3)]
        jax.block_until_ready(states)
        out = []
        for name, kw in pick:
            f = jax.jit(lambda a, b, kw=kw: label_clusters(
                a, b, return_iters=True, **kw))
            t0 = time.time()
            k = int(jax.device_get(f(*states[0])[1]))  # warm + count
            tc = time.time() - t0
            t0 = time.time()
            for st in states:
                int(jax.device_get(f(*st)[1]))
            out.append(f"{name}: {k} iters, "
                       f"{(time.time() - t0) / len(states) * 1e3:.0f} ms "
                       f"(1st incl compile {tc:.0f} s)")
        print(f"L={L} Tc equilibrium | " + "  |  ".join(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
