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
- The whole swap round is DEVICE-RESIDENT (default `batched=True`): all
  K rungs' sweep loops, energy row partials, and magnetization row
  counts are unrolled into ONE jitted round function — one dispatch plus
  one device_get per round, instead of K dispatches + K fetches (the
  tunnel round trip is the documented wall for small-lattice ladders).
  Unrolling (rather than vmap) is deliberate: every backend bakes its
  RNG seed in as a static kernel constant, so K rungs with K seeds are K
  kernel variants either way, and unrolling keeps each rung's traced
  expression IDENTICAL to its solo `Simulation.advance` — trajectories
  and swap records are bit-equal to the sequential path by construction
  (`batched=False` keeps that path available; tests compare the two).
  The shared disorder links ride as jit arguments, never closure
  captures (see parallel/sharded.py on the literal-constant trap).
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


def equalize_ladder(temps, pair_acceptance, floor: float = 0.01):
    """One acceptance-equalization feedback iteration on a ladder.

    Standard practice (Kofke/Katzgraber feedback): place the interior
    rungs at uniform quantiles of the cumulative exchange "resistance"
    r_i = max(1 - a_i, floor) accumulated along the ladder, endpoints
    fixed — hard pairs (low measured acceptance a_i) attract rungs,
    easy stretches shed them. Iterate measure -> equalize -> re-measure
    until the pair acceptances flatten (2-3 iterations typically do).
    """
    import numpy as np
    t = np.asarray(temps, np.float64)
    if t.size - 1 != len(pair_acceptance):
        raise ValueError("need one acceptance rate per adjacent pair")
    r = np.maximum(1.0 - np.asarray(pair_acceptance, np.float64), floor)
    lam = np.concatenate([[0.0], np.cumsum(r)])
    targets = np.linspace(0.0, float(lam[-1]), t.size)
    return [float(x) for x in np.interp(targets, lam, t)]


class ParallelTempering:
    """K-replica exchange driver over one quenched-disorder realization.

    cfg supplies everything but the temperature (geometry, backend, rng,
    j_prob/j_seed, sharding); `temps` is the ladder, strictly positive,
    in rung order (ascending is conventional; adjacency follows the given
    order). Each rung i runs `dataclasses.replace(cfg, temp=temps[i],
    seed=replica_seeds[i], j_seed=<shared>)`.
    """

    def __init__(self, cfg: SimConfig, temps, *, sweeps_per_swap: int = 8,
                 replica_seeds=None, swap_seed: int | None = None,
                 batched: bool = True):
        temps = [float(t) for t in temps]
        if len(temps) < 2:
            raise ValueError("parallel tempering needs at least 2 rungs")
        if any(t <= 0 for t in temps):
            raise ValueError("rung temperatures must be > 0 (beta finite)")
        if sweeps_per_swap < 1:
            raise ValueError("sweeps_per_swap must be >= 1")
        if cfg.field != 0.0:
            # Swap decisions compare BOND energies only; a field term
            # -h sum(s) differs per replica and would bias the exchange.
            raise ValueError("parallel tempering supports field == 0 only")
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
        # Round-trip diagnostics: _extreme[r] = last ladder end replica r
        # touched; a bottom<->top flip pair is one completed round trip —
        # THE mixing figure of merit for PT (acceptance alone can look
        # healthy while replicas never traverse).
        self._extreme = [None] * len(temps)
        self._extreme[self.replica_at[0]] = "bottom"
        self._extreme[self.replica_at[-1]] = "top"
        self._flips = [0] * len(temps)
        self.batched = bool(batched)
        self._round_fn = None   # built lazily on the first batched round
        self._round_key = None  # steppers it was built against
        self._cache = None      # last batched round's (H, up-counts)
        # Observables inline into the jitted round only while the whole
        # ladder's transients stay small: under jit the row-chunk fences
        # are no-ops (observables._fence), so XLA may schedule every
        # rung's energy slabs concurrently — at giant per-rung shapes
        # that would OOM where the sequential path's fenced chunking is
        # exactly what keeps it alive. Past the cap, the round function
        # returns states only and the partials run as eager fenced
        # dispatches (still ONE fetch; see _advance_round_batched).
        be = self.sims[0].backend
        bytes_per_spin = 1 if hasattr(be, "energy_rows") else 4
        self._inline_obs = (len(self.sims) * cfg.nspins * bytes_per_spin
                            <= 1 << 31)

    def _swap_draw(self, pair: int) -> int:
        """One u32 for this (round, pair) proposal — its own counter
        stream, so lattice draws and swap draws never collide."""
        return philox4x32_scalar(
            (self.round & _M32, (self.round >> 32) & _M32, pair, 0x5EAB),
            (self.swap_seed & _M32, (self.swap_seed >> 32) & _M32))[0]

    def _do_swaps(self, H, *extras):
        """DEO adjacent-pair proposals given the rung Hamiltonians H
        (exact ints). Swaps rebind array handles only (zero device work);
        any `extras` lists (per-rung cached values) are permuted along."""
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
                for lst in (H, self.replica_at, *extras):
                    lst[i], lst[j] = lst[j], lst[i]
        self.round += 1
        rb, rt = self.replica_at[0], self.replica_at[-1]
        if self._extreme[rb] == "top":
            self._flips[rb] += 1
        self._extreme[rb] = "bottom"
        if rt != rb:
            if self._extreme[rt] == "bottom":
                self._flips[rt] += 1
            self._extreme[rt] = "top"

    def swap_phase(self):
        """One DEO phase of adjacent-pair exchange proposals."""
        import jax
        import numpy as np
        # Physical energies H = -bondsum (exact ints), every rung's row
        # partials fetched in ONE device_get (the per-rung fetch cost is
        # round-trip latency, not bytes, on the remote-TPU tunnel).
        rows = jax.device_get([s._energy_rows() for s in self.sims])
        self._do_swaps([-int(np.asarray(r, np.int64).sum()) for r in rows])

    def _build_round_fn(self):
        """One jitted function for the WHOLE swap round: every rung's
        sweep loop + energy rows + magnetization rows, unrolled. Each
        rung's sub-expression is exactly what its solo stepper traces
        (same `raw` loop, same thr/step operands), so trajectories are
        bit-identical to the sequential path. First call compiles a
        K-times-larger program (repeat temps/seeds hit the kernel cache)."""
        import jax
        from functools import partial
        sims = self.sims

        inline_obs = self._inline_obs

        @partial(jax.jit, donate_argnums=(0, 1))
        def round_fn(blacks, whites, thrs, step0, n, jbs, jws, links):
            out = []
            for i, s in enumerate(sims):
                b, w = s._step_n.raw(blacks[i], whites[i], thrs[i],
                                     step0, n, jbs[i], jws[i])
                if inline_obs:
                    # Single-slab (row_chunk >= nrows): fully traceable,
                    # and the size cap above bounds the transients.
                    er = s._energy_rows_for(b, w, links=links[i],
                                            row_chunk=s.cfg.nrows)
                    out.append((b, w, er, s._up_rows_for(b, w)))
                else:
                    out.append((b, w))
            return tuple(zip(*out))

        return round_fn

    def _advance_round_batched(self):
        import jax
        import numpy as np
        # A rung's stepper is rebuilt when its kernel constants change
        # (Simulation.set_temperature on a temp_static backend): the round
        # function must be rebuilt with it or it would keep stepping with
        # the stale baked thresholds.
        key = tuple(id(s._step_n) for s in self.sims)
        if self._round_fn is None or key != self._round_key:
            self._round_fn = self._build_round_fn()
            self._round_key = key
        import jax.numpy as jnp
        step0 = self.sims[0].step
        assert all(s.step == step0 for s in self.sims), \
            "rungs advanced out of lockstep"
        outs = self._round_fn(
            tuple(s.black for s in self.sims),
            tuple(s.white for s in self.sims),
            tuple(s._thr for s in self.sims),
            jnp.uint32(step0), self.sweeps_per_swap,
            tuple(s._step_n.jargs[0] for s in self.sims),
            tuple(s._step_n.jargs[1] for s in self.sims),
            tuple(s._links_store for s in self.sims))
        bs, ws = outs[0], outs[1]
        for s, b, w in zip(self.sims, bs, ws):
            s.black, s.white = b, w
            s.step = step0 + self.sweeps_per_swap
        if self._inline_obs:
            ers, urs = outs[2], outs[3]
        else:
            # Giant rungs: eager per-rung partials (fenced row chunking
            # bounds live memory), async dispatches joined by the fetch.
            ers = [s._energy_rows() for s in self.sims]
            urs = [s._up_rows_for(s.black, s.white) for s in self.sims]
        ers, urs = jax.device_get((ers, urs))  # the round's ONE fetch
        H = [-int(np.asarray(r, np.int64).sum()) for r in ers]
        ups = [int(np.asarray(u, np.int64).sum()) for u in urs]
        self._do_swaps(H, ups)
        self._cache = {"steps": tuple(s.step for s in self.sims),
                       "round": self.round, "H": H, "ups": ups}

    def advance_round(self):
        """sweeps_per_swap sweeps on every rung, then one swap phase.

        batched=True: one dispatch + one device fetch for the whole round;
        batched=False: per-rung dispatches (the pre-round-4 path, kept as
        the independently-traced comparison baseline)."""
        if self.batched:
            self._advance_round_batched()
        else:
            for s in self.sims:
                s.advance(self.sweeps_per_swap)
            self.swap_phase()

    def run(self, nrounds: int):
        for _ in range(nrounds):
            self.advance_round()
        return self.stats()

    def stats(self):
        """Per-pair acceptance rates, rung->replica permutation, and
        per-replica completed round trips (bottom<->top<->bottom)."""
        rates = [a / n if n else 0.0
                 for a, n in zip(self.accepts, self.attempts)]
        return {"round": self.round, "pair_acceptance": rates,
                "replica_at": list(self.replica_at),
                "round_trips": [f // 2 for f in self._flips]}

    def retemper(self, temps):
        """Move the rungs (not the configurations) to a new ladder — the
        feedback loop with equalize_ladder(stats()["pair_acceptance"]).
        Resets the acceptance counters (rates on the old ladder do not
        describe the new one); round-trip counters persist (replica
        lineages are unchanged). Static-threshold backends rebuild their
        rung steppers inside set_temperature; the batched round function
        is rebuilt lazily on the next round."""
        temps = [float(t) for t in temps]
        if len(temps) != len(self.sims):
            raise ValueError("ladder size cannot change in retemper")
        if any(t <= 0 for t in temps):
            raise ValueError("rung temperatures must be > 0")
        self.temps = temps
        self.betas = [1.0 / t for t in temps]
        for s, t in zip(self.sims, temps):
            s.set_temperature(t)
        self.attempts = [0] * (len(temps) - 1)
        self.accepts = [0] * (len(temps) - 1)
        self._cache = None
        self._round_fn = None
        self._round_key = None

    def measure(self):
        """Per-rung observables: temp + magnetization + energy/spin
        (+ the exact integer Hamiltonian as "hamiltonian").

        Free after a batched round (the round function already returned
        every rung's row partials — values are served from that round's
        fetch, post-swap order); otherwise all rungs' partials are fetched
        in ONE device_get rather than 2K sequential round trips."""
        c = self._cache
        if c is not None and c["round"] == self.round and \
                c["steps"] == tuple(s.step for s in self.sims):
            H, ups = c["H"], c["ups"]
        else:
            import jax
            import numpy as np
            urs, ers = jax.device_get(
                ([s._up_rows_for(s.black, s.white) for s in self.sims],
                 [s._energy_rows() for s in self.sims]))
            ups = [int(np.asarray(u, np.int64).sum()) for u in urs]
            H = [-int(np.asarray(r, np.int64).sum()) for r in ers]
        out = []
        for t, s, u, h in zip(self.temps, self.sims, ups, H):
            n = s.cfg.nspins
            out.append({"step": s.step,
                        "magnetization": abs(2 * u - n) / n,
                        "up": u, "down": n - u, "temp": t,
                        "energy": h / n, "hamiltonian": h})
        return out

    def collect_energies(self, nrounds: int):
        """Run nrounds and return per-RUNG total-energy series.

        The return value feeds reweight.wham(runs, pt.temps) directly:
        rung k's series samples the fixed temperature temps[k] (post-swap
        configurations — exactly the ensemble WHAM assumes), so a PT run
        doubles as a multiple-histogram dataset with no extra sampling.
        Energies are the exact integer Hamiltonians measure() already
        fetched; on batched rounds the whole collection costs nothing
        beyond the rounds themselves.
        """
        import numpy as np
        out = [[] for _ in self.sims]
        for _ in range(int(nrounds)):
            self.advance_round()
            for k, m in enumerate(self.measure()):
                out[k].append(m["hamiltonian"])
        return [np.asarray(r, np.float64) for r in out]


def replica_overlap(pt_a: ParallelTempering, pt_b: ParallelTempering):
    """Per-rung Edwards-Anderson overlaps q_k between two INDEPENDENT
    tempering ladders over the same quenched disorder.

    The standard spin-glass ensemble: two replicas per (realization,
    temperature) — same j_seed, different thermal seeds — and
    q(T_k) = (1/N) sum_i s^(a)_i s^(b)_i compared rung by rung. Collect
    the returned lists over rounds for P(q) histograms and the overlap
    Binder ratio (analysis.binder_g), whose size crossings locate T_SG.
    All K rungs' XOR row partials are fetched in ONE device_get (the
    same batching discipline as measure()).

    Raises on mismatched ladders/geometry/disorder, and on identical
    replica seeds at any rung (the "two replicas" would be one
    trajectory; q = 1 by construction, not physics).
    """
    import jax
    import numpy as np
    if pt_a.temps != pt_b.temps:
        raise ValueError("ladders must share the temperature grid")
    for k, (sa, sb) in enumerate(zip(pt_a.sims, pt_b.sims)):
        ca, cb = sa.cfg, sb.cfg
        if (ca.nrows, ca.ncols) != (cb.nrows, cb.ncols):
            raise ValueError("overlap needs matching lattice geometry")
        if (ca.j_prob, ca.j_seed) != (cb.j_prob, cb.j_seed):
            raise ValueError(
                "replica overlap needs the SAME disorder realization: "
                f"rung {k} has (j_prob, j_seed) = "
                f"({ca.j_prob}, {ca.j_seed}) vs ({cb.j_prob}, {cb.j_seed})")
    # Seed disjointness must hold GLOBALLY, not rung-by-rung: swaps move
    # configurations across rungs, so any shared stream anywhere couples
    # the two "independent" ladders' trajectories.
    shared = ({s.cfg.seed for s in pt_a.sims}
              & {s.cfg.seed for s in pt_b.sims})
    if shared:
        raise ValueError(
            f"ladders share thermal seed(s) {sorted(shared)}; independent "
            "replicas need globally distinct seeds on every rung "
            "(pass different cfg.seed / replica_seeds)")
    rows = jax.device_get([sa._overlap_neq_rows_with(sb)
                           for sa, sb in zip(pt_a.sims, pt_b.sims)])
    return [1.0 - 2.0 * int(np.asarray(r, np.int64).sum()) / s.cfg.nspins
            for r, s in zip(rows, pt_a.sims)]
