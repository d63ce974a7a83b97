"""Swendsen-Wang cluster updates: the critical-slowing-down killer.

Beyond the reference (all four of its tiers are single-spin Metropolis):
near Tc local updates decorrelate in tau ~ L^2.17 sweeps, which is exactly
where the Binder/xi_L Tc-sweep workloads live; Swendsen-Wang (Phys. Rev.
Lett. 58, 86 (1987)) flips whole Fortuin-Kasteleyn clusters and drops the
dynamic exponent to z ~ 0.35.

TPU-native design — no union-find, no atomics, no host round trips:

  * Bond percolation: aligned neighbor pairs open with p = 1 - exp(-2/T),
    decided by comparing raw counter-based Philox draws (TAG_CLUSTER
    streams) against a host-precomputed uint32 threshold — the same
    integer-compare discipline as the Metropolis accept path, so whole
    trajectories are bit-reproducible for a given seed.
  * Cluster labeling: iterative min-label propagation over open bonds
    (pure stencil min — rolls and selects, perfectly vectorizable) with a
    pointer-jumping contraction (label <- label[label], one gather) each
    iteration, inside ONE lax.while_loop that exits when labels stop
    changing. Propagation alone needs O(cluster diameter) iterations; the
    jump makes label trees collapse geometrically, and even the stencil
    bound beats Metropolis asymptotically at Tc: O(L) cheap iterations
    per decorrelation vs O(L^2.17) full sweeps.
  * Cluster flip: every site draws the SAME coin as its cluster root —
    one elementwise Threefry of the root id under a per-step stream key.
    No per-cluster lists ever materialize.

Scope (fenced in __init__): ferromagnetic J = +1 (frustrated +-J has no
FK representation), zero field, full-lattice wrap, single device. Labels
are int32 site ids, so nrows * ncols < 2^31. State is the full (Y, X)
uint8 bit lattice — the probe regime is "fits decoded", i.e. anything up
to ~2^30 spins; the Metropolis tiers remain the giant-lattice path.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .config import SimConfig
from .lattice import compact_to_full, full_to_compact, init_bits
from .rng import TAG_CLUSTER, color_draws, threefry2x32, threefry_stream_key


def bond_threshold(temp: float) -> int:
    """uint32 open-bond threshold: open <=> draw <= thr, p = 1 - exp(-2/T).

    T <= 0 degenerates to p = 1 (every aligned pair bonds: clusters are
    the geometric domains). Host-side float64, like ising.threshold_table.
    """
    p = 1.0 if temp <= 0 else 1.0 - math.exp(-2.0 / temp)
    return int(np.rint(min(p, 1.0) * 4294967295.0))


def open_bonds(full, draws_r, draws_d, thr):
    """(open_r, open_d) bool planes: bond (y,x)-(y,x+1) / (y,x)-(y+1,x)
    open. A bond can only open between ALIGNED spins (FK representation);
    the draw compare is a raw u32 <= threshold."""
    t = jnp.uint32(thr)
    open_r = (full == jnp.roll(full, -1, axis=1)) & (draws_r <= t)
    open_d = (full == jnp.roll(full, -1, axis=0)) & (draws_d <= t)
    return open_r, open_d


def label_clusters(open_r, open_d):
    """int32 (Y, X) plane of per-site cluster labels (= min site id of the
    connected component under the open bonds, periodic in both axes).

    Min-label stencil propagation + pointer jumping in one while_loop;
    every iteration is O(N) vector work and one O(N) gather. Exits when a
    full iteration changes nothing (guaranteed: labels are non-increasing
    and bounded below by the cluster min)."""
    Y, X = open_r.shape
    ids = jnp.arange(Y * X, dtype=jnp.int32).reshape(Y, X)

    def body(state):
        lab, _ = state
        # Pull the neighbor's label across every open bond, both ways.
        l_r = jnp.where(open_r, jnp.roll(lab, -1, axis=1), lab)
        l_l = jnp.where(jnp.roll(open_r, 1, axis=1),
                        jnp.roll(lab, 1, axis=1), lab)
        l_d = jnp.where(open_d, jnp.roll(lab, -1, axis=0), lab)
        l_u = jnp.where(jnp.roll(open_d, 1, axis=0),
                        jnp.roll(lab, 1, axis=0), lab)
        # Own label must stay in the min (labels are monotone
        # non-increasing — without it a cluster minimum with all four
        # bonds open would LOSE its label and the loop could cycle).
        new = jnp.minimum(lab, jnp.minimum(jnp.minimum(l_r, l_l),
                                           jnp.minimum(l_d, l_u)))
        # Pointer jump: new[i] is a same-cluster site id <= i, so chasing
        # it one hop stays in-cluster and is monotone — label trees halve.
        new = jnp.take(new.reshape(-1), new)
        return new, jnp.any(new != lab)

    lab, _ = lax.while_loop(lambda s: s[1], body,
                            (ids, jnp.asarray(True)))
    return lab


def cluster_coins(labels, seed: int, step):
    """uint8 (Y, X) flip mask: bit 31 of Threefry(root id) under the
    per-(step, TAG_CLUSTER|2) stream key — all sites of a cluster draw
    the SAME coin because they share the root id."""
    k0, k1 = threefry_stream_key(seed, step, TAG_CLUSTER | 2)
    x0, _ = threefry2x32(labels.astype(jnp.uint32),
                         jnp.zeros_like(labels, jnp.uint32), k0, k1, 13)
    return (x0 >> 31).astype(jnp.uint8)


def sw_step(full, thr, seed: int, step):
    """One Swendsen-Wang update of the full (Y, X) uint8 bit lattice."""
    Y, X = full.shape
    draws_r = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 0,
                          row_stride=X)
    draws_d = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 1,
                          row_stride=X)
    open_r, open_d = open_bonds(full, draws_r, draws_d, thr)
    labels = label_clusters(open_r, open_d)
    return full ^ cluster_coins(labels, seed, step)


class SwendsenWang:
    """Cluster-update driver sharing the SimConfig surface and seed/init
    contract with Simulation (same initial lattice for the same seed, so
    the two dynamics are directly comparable on one realization).

    Use for equilibrium sampling near Tc (tc_sweep-style workloads);
    step counts mean SW updates, not Metropolis sweeps.
    """

    def __init__(self, cfg: SimConfig, *, state=None, step0: int = 0):
        if cfg.backend != "xla":
            raise ValueError("cluster updates operate on decoded planes; "
                             "use backend='xla'")
        if cfg.j_prob is not None:
            raise ValueError("Swendsen-Wang needs a ferromagnetic "
                             "Hamiltonian (frustrated +-J has no FK "
                             "cluster representation)")
        if cfg.field != 0.0:
            raise ValueError("Swendsen-Wang supports field == 0 only "
                             "(a field breaks the cluster flip symmetry)")
        if cfg.xsl is not None or cfg.ndev != 1:
            raise ValueError("cluster updates are single-device, "
                             "full-lattice wrap (probe scope)")
        if cfg.nrows * cfg.ncols >= 2 ** 31:
            raise ValueError("labels are int32 site ids: needs "
                             "nrows * ncols < 2^31")
        self.cfg = cfg
        self.temp = cfg.temperature
        self.step = int(step0)
        if state is None:
            state = init_bits(cfg.seed, cfg.nrows, cfg.ncols)
        self.full = jnp.asarray(compact_to_full(*state))
        self._thr = jnp.uint32(bond_threshold(self.temp))
        self._step_jit = jax.jit(
            lambda f, t, s: sw_step(f, t, self.cfg.seed, s))

    def set_temperature(self, temp: float):
        self.temp = float(temp)
        self._thr = jnp.uint32(bond_threshold(self.temp))

    def advance(self, nsteps: int):
        for _ in range(nsteps):
            self.full = self._step_jit(self.full, self._thr,
                                       jnp.uint32(self.step))
            self.step += 1

    def bits(self):
        """Compact (black, white) planes of the current state — the same
        storage Simulation(state=...) accepts, for hybrid protocols."""
        return full_to_compact(self.full)

    def measure(self):
        from . import observables
        n_up, n_dn = observables.count_spins(*self.bits())
        return {"step": self.step, "magnetization":
                abs(n_up - n_dn) / (n_up + n_dn), "up": n_up, "down": n_dn}

    def energy(self) -> float:
        from . import observables
        return observables.energy_per_spin(*self.bits())
