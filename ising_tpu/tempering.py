"""Parallel tempering (replica exchange) over a temperature ladder.

Beyond the reference's feature set: its spin-glass support stops at
single-temperature quenched-disorder runs (optimized/main.cu:1374-1378,
the -J flag). Here K replicas of ONE disorder realization (cfg.j_seed)
run at temperatures T_0 .. T_{K-1}; after every `sweeps_per_swap` full
lattice sweeps, adjacent ladder pairs propose a CONFIGURATION exchange
with the standard Metropolis probability

    p = min(1, exp((beta_i - beta_j) * (E_i - E_j))),   E = H(X) = -bondsum.

Design notes (TPU + library discipline):

- Each rung is a full `Simulation` — any backend, any rng mode. Because
  configurations move between rungs (never temperatures), static-
  temperature kernels (bit1-hw's baked k-bit thresholds) are traced once
  per rung and never rebuilt, and a swap costs two array rebinds, zero
  device work.
- Replicas share the quenched links via `j_seed` but get independent
  update streams via distinct `seed`s — the standard "one realization,
  many thermal histories" ensemble.
- Swap decisions keep the library's integer-acceptance invariant: the
  energies are exact int64 bond sums (`Simulation.energy_total`), and the
  accept test compares a raw u32 draw from a dedicated scalar
  Philox4x32-10 stream (keyed off `swap_seed`, countered by
  (round, pair)) against a host-precomputed integer threshold
  floor(p * 2^32). Trajectories and swap records are therefore
  bit-reproducible for a fixed config across backends and device counts.
- Pairing alternates even rounds (0-1, 2-3, ...) and odd rounds
  (1-2, 3-4, ...): the deterministic-even-odd (DEO) schedule, which
  mixes better than random pairing and needs no extra randomness.
- Rungs step sequentially (K dispatches per round, energies fetched in
  one batched device_get). On a locally-attached chip dispatch is ~10 us
  and the chip is time-shared efficiently; through the remote-tunnel dev
  environment each dispatch pays the tunnel round trip, which dominates
  small-lattice ladders. A fully-batched stepper (vmap over a stacked
  rung axis) would cut that to one dispatch per round but needs traced
  RNG seeds through every backend's kernel signature (today they are
  static key constants); revisit if PT becomes a hot production path
  rather than an auxiliary workflow.
"""

from __future__ import annotations

import dataclasses
import math

from .config import SimConfig
from .driver import Simulation

_M32 = 0xFFFFFFFF
# Philox4x32 round/Weyl constants (Random123; same constants the vector
# implementation in rng.py uses — this scalar twin is for O(K) host-side
# swap draws, where a device round trip per decision would be absurd).
_PHILOX_M0, _PHILOX_M1 = 0xD2511F53, 0xCD9E8D57
_PHILOX_W0, _PHILOX_W1 = 0x9E3779B9, 0xBB67AE85


def philox4x32_scalar(ctr, key, rounds: int = 10):
    """Philox4x32 block on Python ints: (4-tuple ctr, 2-tuple key) -> 4 u32."""
    x0, x1, x2, x3 = (c & _M32 for c in ctr)
    k0, k1 = key[0] & _M32, key[1] & _M32
    for _ in range(rounds):
        p0 = _PHILOX_M0 * x0
        p1 = _PHILOX_M1 * x2
        x0, x1, x2, x3 = (((p1 >> 32) ^ x1 ^ k0) & _M32, p1 & _M32,
                          ((p0 >> 32) ^ x3 ^ k1) & _M32, p0 & _M32)
        k0 = (k0 + _PHILOX_W0) & _M32
        k1 = (k1 + _PHILOX_W1) & _M32
    return x0, x1, x2, x3


def swap_threshold_u32(dbeta: float, denergy: int) -> int:
    """floor(min(1, exp(dbeta * denergy)) * 2^32), clamped to [0, 2^32].

    2^32 (not 2^32 - 1) marks the certain-accept case so `u < t` is
    exact at both ends: p = 1 always accepts, p = 0 never does.
    """
    arg = dbeta * denergy
    if arg >= 0.0:
        return 1 << 32
    return int(math.exp(arg) * (1 << 32))


class ParallelTempering:
    """K-replica exchange driver over one quenched-disorder realization.

    cfg supplies everything but the temperature (geometry, backend, rng,
    j_prob/j_seed, sharding); `temps` is the ladder, strictly positive,
    in rung order (ascending is conventional; adjacency follows the given
    order). Each rung i runs `dataclasses.replace(cfg, temp=temps[i],
    seed=replica_seeds[i], j_seed=<shared>)`.
    """

    def __init__(self, cfg: SimConfig, temps, *, sweeps_per_swap: int = 8,
                 replica_seeds=None, swap_seed: int | None = None):
        temps = [float(t) for t in temps]
        if len(temps) < 2:
            raise ValueError("parallel tempering needs at least 2 rungs")
        if any(t <= 0 for t in temps):
            raise ValueError("rung temperatures must be > 0 (beta finite)")
        if sweeps_per_swap < 1:
            raise ValueError("sweeps_per_swap must be >= 1")
        if replica_seeds is None:
            # Distinct odd-spaced streams; any distinct values do.
            replica_seeds = [cfg.seed + 1000003 * i
                            for i in range(len(temps))]
        if len(replica_seeds) != len(temps):
            raise ValueError("one replica seed per rung")
        j_seed = cfg.seed if cfg.j_seed is None else cfg.j_seed
        self.temps = temps
        self.betas = [1.0 / t for t in temps]
        self.sweeps_per_swap = int(sweeps_per_swap)
        self.swap_seed = cfg.seed ^ 0x9E3779B97F4A7C15 if swap_seed is None \
            else int(swap_seed)
        self.sims = [Simulation(dataclasses.replace(
            cfg, temp=t, alpha=None, seed=int(s), j_seed=j_seed))
            for t, s in zip(temps, replica_seeds)]
        # replica_at[rung] = index of the replica (initial-state lineage)
        # currently holding that rung — the round-trip diagnostic.
        self.replica_at = list(range(len(temps)))
        self.round = 0
        self.attempts = [0] * (len(temps) - 1)
        self.accepts = [0] * (len(temps) - 1)

    def _swap_draw(self, pair: int) -> int:
        """One u32 for this (round, pair) proposal — its own counter
        stream, so lattice draws and swap draws never collide."""
        return philox4x32_scalar(
            (self.round & _M32, (self.round >> 32) & _M32, pair, 0x5EAB),
            (self.swap_seed & _M32, (self.swap_seed >> 32) & _M32))[0]

    def swap_phase(self):
        """One DEO phase of adjacent-pair exchange proposals."""
        import jax
        import numpy as np
        # Physical energies H = -bondsum (exact ints), every rung's row
        # partials fetched in ONE device_get (the per-rung fetch cost is
        # round-trip latency, not bytes, on the remote-TPU tunnel).
        rows = jax.device_get([s._energy_rows() for s in self.sims])
        H = [-int(np.asarray(r, np.int64).sum()) for r in rows]
        for i in range(self.round % 2, len(self.sims) - 1, 2):
            j = i + 1
            self.attempts[i] += 1
            t = swap_threshold_u32(self.betas[i] - self.betas[j],
                                   H[i] - H[j])
            if self._swap_draw(i) < t:
                self.accepts[i] += 1
                si, sj = self.sims[i], self.sims[j]
                si.black, sj.black = sj.black, si.black
                si.white, sj.white = sj.white, si.white
                H[i], H[j] = H[j], H[i]
                self.replica_at[i], self.replica_at[j] = \
                    self.replica_at[j], self.replica_at[i]
        self.round += 1

    def advance_round(self):
        """sweeps_per_swap sweeps on every rung, then one swap phase."""
        for s in self.sims:
            s.advance(self.sweeps_per_swap)
        self.swap_phase()

    def run(self, nrounds: int):
        for _ in range(nrounds):
            self.advance_round()
        return self.stats()

    def stats(self):
        """Per-pair acceptance rates + current rung->replica permutation."""
        rates = [a / n if n else 0.0
                 for a, n in zip(self.accepts, self.attempts)]
        return {"round": self.round, "pair_acceptance": rates,
                "replica_at": list(self.replica_at)}

    def measure(self):
        """Per-rung observables: temp + magnetization + energy/spin."""
        out = []
        for t, s in zip(self.temps, self.sims):
            m = s.measure()
            m["temp"] = t
            m["energy"] = s.energy()
            out.append(m)
        return out
