"""Simulation driver: the host loop around the jitted step function.

Mirrors the reference flagship's main loop (optimized/main.cu:1762-1871):
chunks of update steps run device-side inside one jitted `fori_loop`; the
host syncs only at measurement events (fixed cadence -p or exponential -e
schedule), where it prints magnetization, optionally appends correlation
rows / dumps the lattice, checks the target-magnetization early exit, and
applies the temperature ramp (which only swaps the threshold-table argument
— no recompilation). The final report prints flips/ns and an effective
bandwidth figure computed the same way as the reference
(optimized/main.cu:1884-1890).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from .config import SimConfig
from .constants import (BLACK, MAX_CORR_LEN, MIN_TEMP,
                        TGT_MAGN_MAX_DIFF, WHITE)
from . import io as lio
from . import observables
from .lattice import init_store, links_to_color_planes
from .models import ising
from .ops import get_backend
from .parallel import make_sharded_stepper


def exponential_print_steps(nsteps: int) -> list[int]:
    """Measurement steps ~ distinct values of rint(2^(j/4)).

    The reference's generate_times additionally thins this to >=2x gaps
    starting at 152 (optimized/main.cu:1211-1228, reproduced exactly in
    reference_exp_times below), tuned for very long runs; this denser
    variant keeps every distinct value of the 2^(j/4) series, which matches
    the documented intent and is useful at any run length.
    """
    out = []
    j = 0
    while True:
        t = int(round(2.0 ** (j / 4.0)))
        if t > nsteps:
            break
        if not out or t != out[-1]:
            out.append(t)
        j += 1
    return out


def reference_exp_times(nsteps: int) -> list[int]:
    """The reference's exact -e schedule (optimized/main.cu:1211-1228).

    Starts at 152 (MIN_EXP_TIME) and appends the first rint(2^(j/4)) that
    is >= 2x the previous entry, up to 200 entries (MAX_EXP_TIME), scanning
    j while the last computed time is below nsteps — bit-faithful port of
    generate_times including its append-past-nsteps edge case (callers
    filter to <= nsteps).
    """
    times = [152]
    t = 0
    j = 0
    while j < nsteps and t < nsteps:
        t = int(round(2.0 ** (j / 4.0)))
        if t >= 2 * times[-1] and len(times) < 200:
            times.append(t)
        j += 1
    return times


def build_disorder(cfg, backend, chunk_rows: int = 8192):
    """(links, links_packed, jplanes) for cfg.j_prob, built in row chunks.

    One-shot link generation materializes several full-lattice planes at
    once and fails at the reference's 65536^2-per-chip size (where the
    reference itself supports -J); chunked generation is bit-identical
    (counter-based link draws + row-local projections, with the one v halo
    row each chunk's j_up needs). The (v, h) link planes stay on device
    BIT-PACKED when ncols % 64 == 0 (1/8 the bytes; at 65536^2 the 8.6 GB
    of uint8 links plus the sweep's working set did not fit), stored
    PARITY-SPLIT as (vE, vO, hE, hO) word planes — the layout the bit1
    word-domain disordered energy consumes directly
    (observables._bit1_energy_block_dis); the streamed byte-plane
    observables re-interleave per slab (Simulation._links_slab).
    """
    Y, X = cfg.nrows, cfg.ncols
    enc = getattr(backend, "encode_jplanes", lambda p: p)
    links_packed = X % 64 == 0
    if links_packed:
        from .ops.pallas_bit1 import pack_bits1
    R = min(Y, chunk_rows)
    R -= R % 2  # chunks must be even-height (row-parity preserving)
    while Y % R:
        R -= 2
    # When the backend can project the link fields in-kernel (bit1,
    # single device), the parity-split link store IS the jplanes for both
    # colors — no per-color jb/jw planes get built or stored at all
    # (resident disorder drops 3x: what unlocked 131072x65536 + links).
    split = links_packed and getattr(backend, "split_links_capable", False)
    if split:
        backend.split_links = True
    jseed = cfg.seed if cfg.j_seed is None else cfg.j_seed
    link_parts, jb_parts, jw_parts = [], [], []
    for r in range(0, Y, R):
        v_s, h_s = ising.generate_disorder_links(
            jseed, Y, X, cfg.j_prob, row0=r, local_rows=R)
        if not split:
            if R == Y:
                v_up = None
            else:
                v_up, _ = ising.generate_disorder_links(
                    jseed, Y, X, cfg.j_prob, row0=(r - 1) % Y,
                    local_rows=1)
            jb_parts.append(tuple(enc(
                links_to_color_planes(v_s, h_s, BLACK, v_up=v_up))))
            jw_parts.append(tuple(enc(
                links_to_color_planes(v_s, h_s, WHITE, v_up=v_up))))
        if links_packed:
            link_parts.append((pack_bits1(v_s[:, 0::2]),
                               pack_bits1(v_s[:, 1::2]),
                               pack_bits1(h_s[:, 0::2]),
                               pack_bits1(h_s[:, 1::2])))
        else:
            link_parts.append((v_s, h_s))
        jax.block_until_ready((link_parts[-1], jb_parts[-1:], jw_parts[-1:]))
    cat = (lambda ps: ps[0] if len(ps) == 1 else
           tuple(jnp.concatenate([p[i] for p in ps])
                 for i in range(len(ps[0]))))
    links = cat(link_parts)
    if split:
        return links, links_packed, (links, links)
    return links, links_packed, (cat(jb_parts), cat(jw_parts))


class Simulation:
    """One Ising MC run: state + jitted stepper + measurement loop."""

    def __init__(self, cfg: SimConfig, *, state=None, storage=None,
                 step0: int = 0, temp: float | None = None, mesh=None):
        self.cfg = cfg
        self.temp = float(temp) if temp is not None else cfg.temperature
        self.step = int(step0)
        self.backend = get_backend(cfg)

        # A resumed temperature may differ from cfg's START temperature
        # (ramp): sync the backend's static accept variant before the
        # stepper is traced (the same switches set_temperature flips).
        if self.temp != cfg.temperature:
            if hasattr(self.backend, "greedy"):
                self.backend.greedy = self.temp <= 0
            if getattr(self.backend, "temp_static", False):
                self.backend.temperature = self.temp

        # Quenched disorder (shared by all backends via the link fields).
        # The device store is bit-packed when ncols % 64 == 0 (format is an
        # internal detail); the public accessor is links().
        self._links_store = None
        self._links_packed = False
        jplanes = None
        if cfg.j_prob is not None:
            self._links_store, self._links_packed, jplanes = \
                build_disorder(cfg, self.backend)

        self._jplanes = jplanes  # kept for stepper rebuilds (greedy switch)
        self.shardings, self._step_n = make_sharded_stepper(
            cfg, self.backend, mesh=mesh, jplanes=jplanes)

        if storage is not None:
            # Already in this backend's storage domain (streamed resume).
            b, w = storage
        elif state is None:
            # Row-chunked init in storage domain: bit-identical to the
            # one-shot path, O(chunk) transient memory (65536^2+ lattices
            # OOM otherwise while their storage fits easily).
            b, w = init_store(cfg.seed, cfg.nrows, cfg.ncols,
                              self.backend.encode)
        else:
            b, w = self.backend.encode(*state)
        if self.shardings["plane"] is not None:
            b = jax.device_put(b, self.shardings["plane"])
            w = jax.device_put(w, self.shardings["plane"])
        self.black, self.white = b, w
        self._thr = jnp.asarray(ising.threshold_table(self.temp,
                                               self.cfg.field))

    def _links_slab_of(self, store, r: int, n: int):
        """(v, h) uint8 link rows [r, r+n) of the given store (unpacking +
        re-interleaving when parity-split packed)."""
        if self._links_packed:
            from .ops.pallas_bit1 import unpack_bits1
            vE, vO, hE, hO = (unpack_bits1(p[r:r + n]) for p in store)
            inter = lambda a, b: jnp.stack([a, b], axis=2).reshape(
                a.shape[0], 2 * a.shape[1])
            return inter(vE, vO), inter(hE, hO)
        v, h = store
        return v[r:r + n], h[r:r + n]

    def _links_slab(self, r: int, n: int):
        return self._links_slab_of(self._links_store, r, n)

    def links(self):
        """(v, h) full uint8 disorder link planes, or None without -J.

        Always uint8 regardless of the internal (possibly bit-packed)
        device format. Materializes the full planes — at giant shapes
        prefer _links_slab-style row streaming."""
        if self._links_store is None:
            return None
        return self._links_slab(0, self.cfg.nrows)

    # -- state access ------------------------------------------------------

    def bits(self):
        """Current (black, white) uint8 bit planes (decoded)."""
        return self.backend.decode(self.black, self.white)

    def measure(self):
        # Backends with native packed reductions skip the decode (the
        # popcount path of the reference's getMagn_k).
        if hasattr(self.backend, "row_up_counts"):
            rows = self.backend.row_up_counts(self.black, self.white)
            n_up = int(np.asarray(jax.device_get(rows), np.int64).sum())
            n_dn = self.cfg.nspins - n_up
        else:
            n_up, n_dn = observables.count_spins(*self.bits())
        m = abs(n_up - n_dn) / (n_up + n_dn)
        out = {"step": self.step, "magnetization": m,
               "up": n_up, "down": n_dn}
        if self.cfg.field:
            # An external field breaks the +-m symmetry |m| relies on.
            out["m_signed"] = (n_up - n_dn) / (n_up + n_dn)
        return out

    # -- stepping ----------------------------------------------------------

    def advance(self, nsteps: int):
        """Run nsteps (device-side loop); blocks until done."""
        if nsteps <= 0:
            return
        self.black, self.white = self._step_n(
            self.black, self.white, self._thr,
            jnp.uint32(self.step), nsteps)
        self.step += nsteps

    def block(self):
        jax.block_until_ready((self.black, self.white))

    def set_temperature(self, temp: float):
        self.temp = float(temp)
        self._thr = jnp.asarray(ising.threshold_table(self.temp,
                                               self.cfg.field))
        rebuild = False
        if hasattr(self.backend, "greedy") and \
                self.backend.greedy != (self.temp <= 0):
            # Crossing T = 0 switches the packed kernel's static accept
            # variant. The cached jitted stepper captured the old flag at
            # trace time (it is a static kernel argument, not a traced
            # value), so the stepper must be rebuilt, not just retraced.
            self.backend.greedy = self.temp <= 0
            rebuild = True
        if getattr(self.backend, "temp_static", False) and \
                self.backend.temperature != self.temp:
            # bit1-hw bakes its k-bit acceptance thresholds in as static
            # kernel params (the bit-serial compare unrolls on the
            # threshold bits): a temperature change is a new kernel
            # variant. Repeated temperatures hit jit's cache.
            self.backend.temperature = self.temp
            rebuild = True
        if rebuild:
            self.shardings, self._step_n = make_sharded_stepper(
                self.cfg, self.backend, mesh=self.shardings["mesh"],
                jplanes=self._jplanes)

    def set_field(self, field: float):
        """Change the uniform external field mid-run (hysteresis/field-scan
        protocols). On u32 paths this only swaps the threshold-table
        argument — except when h crosses zero in either direction, which
        flips the xla backend's static full-table select (a trace-time
        flag). On static-accept backends (bit1, xla plane modes: the
        thresholds are baked into the kernel) EVERY field change is a new
        kernel variant. Both cases rebuild the stepper; repeated values hit
        jit's cache. Backend/rng fencing reuses SimConfig's validation."""
        field = float(field)
        if field == self.cfg.field:
            return
        was = self.cfg.field != 0.0
        import dataclasses
        self.cfg = dataclasses.replace(self.cfg, field=field)
        self._thr = jnp.asarray(ising.threshold_table(self.temp, field))
        rebuild = False
        if getattr(self.backend, "temp_static", False) and \
                getattr(self.backend, "field", None) != field:
            self.backend.field = field
            rebuild = True
        elif (field != 0.0) != was and hasattr(self.backend, "full_table"):
            self.backend.full_table = field != 0.0
            rebuild = True
        if rebuild:
            self.shardings, self._step_n = make_sharded_stepper(
                self.cfg, self.backend, mesh=self.shardings["mesh"],
                jplanes=self._jplanes)

    # -- the full reference-style run -------------------------------------

    def run(self, log=print):
        return run_loop(self, log=log)


    # -- event actions -----------------------------------------------------

    def _corr_path(self):
        return (f"corr_{self.cfg.nrows}x{self.cfg.ncols}"
                f"_T_{self.temp:f}_{self.cfg.seed}")

    def _decode_rows(self, r: int, n: int):
        """Decoded compact planes for wrapped rows [r, r+n) of the state."""
        from .observables import _rows_wrap
        return self.backend.decode(_rows_wrap(self.black, r, n),
                                   _rows_wrap(self.white, r, n))

    def energy_total(self) -> int:
        """Exact integer bond sum Σ_bonds J_ij s_i s_j over the current
        state (the Hamiltonian is H = -energy_total(); spins ±1, J ±1).
        int32/uint32 row partials on device, int64 finish on host — no
        float anywhere, so parallel-tempering swap decisions can compare
        exactly."""
        return int(np.asarray(jax.device_get(self._energy_rows()),
                              np.int64).sum())

    def _energy_rows_for(self, black, white, links=None,
                         row_chunk: int = 8192):
        """Device int row partials of the bond sum for GIVEN planes.

        A pure function of its array inputs: the disorder links can be
        passed explicitly instead of read from self, so parallel tempering
        can inline this into one jitted round with the (shared) links as a
        jit ARGUMENT — closure-captured device arrays become literal
        constants at lowering (see parallel/sharded.py). With
        row_chunk >= nrows it is single-slab (no host fence), i.e. fully
        traceable."""
        if links is None:
            links = self._links_store
        if self._links_store is None and hasattr(self.backend, "energy_rows"):
            return self.backend.energy_rows(black, white)
        if (self._links_store is not None and self._links_packed
                and hasattr(self.backend, "energy_rows_disordered")):
            return self.backend.energy_rows_disordered(black, white, links)
        decode = lambda r, n: self.backend.decode(
            observables._rows_wrap(black, r, n),
            observables._rows_wrap(white, r, n))
        links_rows = None
        if self._links_store is not None:
            links_rows = lambda r, n: self._links_slab_of(links, r, n)
        return observables.energy_rows_via(decode, self.cfg.nrows,
                                           links_rows=links_rows,
                                           row_chunk=row_chunk)

    def _energy_rows(self):
        """Device-side int row partials of the bond sum (no transfer —
        callers can batch the device_get; parallel tempering fetches all
        rungs' rows in ONE round trip through the tunnel)."""
        return self._energy_rows_for(self.black, self.white)

    def _up_rows_for(self, black, white):
        """Device per-row up-spin counts for GIVEN planes (pure, no
        transfer) — the batchable core of measure()."""
        if hasattr(self.backend, "row_up_counts"):
            return self.backend.row_up_counts(black, white)
        return observables.row_up_counts(*self.backend.decode(black, white))

    def _overlap_neq_rows_with(self, other, row_chunk: int = 8192):
        """Device per-row differing-spin counts vs another Simulation's
        current state (pure, no transfer — batchable like _energy_rows).
        Word-domain on same-storage bit1/packed pairs; otherwise streamed
        through both states' decode."""
        if (type(other.backend) is type(self.backend)
                and hasattr(self.backend, "overlap_neq_rows")):
            return self.backend.overlap_neq_rows(self.black, self.white,
                                                 other.black, other.white)
        return observables.overlap_neq_rows_via(
            self._decode_rows, other._decode_rows, self.cfg.nrows,
            row_chunk=row_chunk)

    def overlap_with(self, other) -> float:
        """Edwards-Anderson replica overlap q = (1/N) sum_i s^(1)_i s^(2)_i
        with another Simulation's current state: +1 identical, -1 opposite,
        ~0 independent. THE spin-glass order parameter — run two sims with
        the same quenched links (j_seed) and independent thermal seeds,
        collect q samples for P(q) and analysis.binder_g. Exact: integer
        XOR counts on device, float finish here. Geometry must match;
        backends may differ (the decode path bridges storage domains).
        Beyond the reference (optimized/main.cu:1374-1378 measures only
        single-replica observables in -J mode)."""
        if (self.cfg.nrows, self.cfg.ncols) != (other.cfg.nrows,
                                                other.cfg.ncols):
            raise ValueError("overlap needs matching lattice geometry")
        neq = int(np.asarray(jax.device_get(
            self._overlap_neq_rows_with(other)), np.int64).sum())
        return 1.0 - 2.0 * neq / self.cfg.nspins

    def fourier_partials(self):
        """Exact (per-row, per-column) up-spin counts, as int64 numpy.

        The integer partials of the Fourier magnetizations m(0) and
        m(k1 = 2*pi/L) along both axes: feed to analysis.kmin_mag2 per
        measurement and the |m|^2 sample pairs to
        analysis.correlation_length for the second-moment xi. One batched
        device fetch; word-domain on bit1 (no decode), streamed from
        storage otherwise. Full-lattice only — replica tiles (xsl/ysl)
        would mix sub-lattices in the line sums.
        """
        if self.cfg.xsl is not None or self.cfg.ysl is not None:
            raise ValueError("fourier_partials needs full-lattice mode "
                             "(replica tiles mix in the line sums); use "
                             "replica_magnetizations for tile statistics")
        rows = self._up_rows_for(self.black, self.white)
        if hasattr(self.backend, "col_up_counts"):
            cols = self.backend.col_up_counts(self.black, self.white)
        else:
            cols = observables.col_up_counts_via(self._decode_rows,
                                                 self.cfg.nrows)
        r, c = jax.device_get((rows, cols))
        return np.asarray(r, np.int64), np.asarray(c, np.int64)

    def energy(self) -> float:
        """Internal energy per spin. Word-domain fast path on bit1 (both
        ordered and disordered — the parity-split packed link store feeds
        the word XORs directly); otherwise streamed from storage per row
        slab (a full-lattice decode plus resident disorder links does not
        fit at 65536^2-per-chip). An external field adds its exact
        -h sum(s) term from the integer up count."""
        e = -float(self.energy_total())
        h = self.cfg.field
        if h:
            ups = int(np.asarray(jax.device_get(
                self._up_rows_for(self.black, self.white)), np.int64).sum())
            e -= h * (2 * ups - self.cfg.nspins)
        return e / self.cfg.nspins

    def _append_corr(self, it: int):
        if self.cfg.xsl is None and hasattr(self.backend, "corr_rows"):
            # Word-domain correlation: no decode of the full bit planes.
            rows = np.asarray(jax.device_get(self.backend.corr_rows(
                self.black, self.white, MAX_CORR_LEN)), np.int64)
            c = rows.sum(axis=1) / (2.0 * self.cfg.nspins)
        elif self.cfg.xsl is None:
            rows = np.asarray(jax.device_get(observables.correlation_rows_via(
                self._decode_rows, self.cfg.nrows, MAX_CORR_LEN)), np.int64)
            c = rows.sum(axis=1) / (2.0 * self.cfg.nspins)
        else:
            b, w = self.bits()
            c = observables.correlation(b, w, xsl=self.cfg.xsl,
                                        ysl=self.cfg.ysl)
        with open(self._corr_path(), "a") as f:
            f.write(f"{it:10d}")
            for val in c:
                f.write(f" {val:< 12G}")
            f.write("\n")

    # Lattices at or above this spin count stream their dumps row-chunk by
    # row-chunk instead of materializing the decoded planes on the host
    # (34 GB at the 524288x65536 flagship shape). Class attribute so tests
    # can lower it to assert the streamed path engages.
    STREAM_DUMP_SPINS = 1 << 30

    def dump(self, name: str):
        """Write the lattice to `name` (hex format), scale-safely: one file
        per shard when sharded (like the reference's per-GPU files,
        optimized/main.cu:1180 — no whole-lattice host gather), row-streamed
        above STREAM_DUMP_SPINS spins (same file bytes), plain otherwise."""
        if self.cfg.ndev > 1:
            b, w = self.bits()
            lio.dump_lattice_sharded(name, b, w, fmt="hex")
        elif self.cfg.nspins >= self.STREAM_DUMP_SPINS:
            be = self.backend
            lio.dump_lattice_streamed(
                name, lambda r0, r1: be.decode(self.black[r0:r1],
                                               self.white[r0:r1]),
                self.cfg.nrows)
        else:
            lio.dump_lattice(name, *self.bits(), fmt="hex")

    def _dump(self, it: int):
        self.dump(f"lattice_{self.cfg.nrows}x{self.cfg.ncols}"
                  f"_T_{self.temp:f}_IT_{it:08d}.txt")

    def checkpoint(self, path: str):
        """Streamed save: decodes one row chunk at a time, so host memory
        stays O(chunk * ncols) even when the decoded planes would not fit
        (the save point of a 524288x65536 run is ~256 MB transient, not
        34 GB). Backends whose storage already is 1 bit/spin (bit1) write
        through the word-domain shuffle instead of a decode->repack round
        trip — the file bytes are identical either way."""
        from .checkpoint import save_checkpoint_streamed
        packed_rows = None
        if hasattr(self.backend, "pack_storage_rows") and \
                self.backend.storage_pack_supported(self.black):
            packed_rows = lambda r0, r1: self.backend.pack_storage_rows(
                self.black, self.white, r0, r1)
        save_checkpoint_streamed(
            path,
            lambda r0, r1: self.backend.decode(self.black[r0:r1],
                                               self.white[r0:r1]),
            self.cfg.nrows, self.cfg.ncols,
            step=self.step, temp=self.temp, cfg=self.cfg,
            packed_rows=packed_rows)

    @classmethod
    def from_checkpoint(cls, path: str, **overrides):
        """Streamed resume, possibly into a DIFFERENT backend: each row
        chunk is re-encoded into the target backend's storage as it is
        read, so only the (compact) storage accumulates on device."""
        from .checkpoint import load_checkpoint_state, read_checkpoint_meta
        meta = read_checkpoint_meta(path)
        cfg = meta["cfg"]
        if overrides:
            import dataclasses
            cfg = dataclasses.replace(cfg, **overrides)
        be = get_backend(cfg)
        # The backend's encode_packed_rows returns None on unsupported
        # geometry and the loader falls back to the decode path — no
        # geometry knowledge duplicated here.
        encode_packed = getattr(be, "encode_packed_rows", None)
        (b, w), meta = load_checkpoint_state(path, be.encode,
                                             encode_packed=encode_packed)
        return cls(cfg, storage=(b, w), step0=meta["step"],
                   temp=meta["temp"])


def run_loop(self, log=print):
    """The reference-style measurement loop (optimized/main.cu:1762-1871),
    duck-typed over any driver exposing the Simulation surface (cfg, temp,
    advance, block, measure, set_temperature, optional _append_corr/_dump):
    Simulation (Metropolis, any backend) and cluster.SwendsenWang both run
    through it, so `-p/-e/-E/-m/-u/-o/-c` behave identically under --algo."""
    cfg = self.cfg
    t_unit = cfg.temperature

    if cfg.nwarmup:
        self.advance(cfg.nwarmup)
        self.block()

    # Build the measurement / temperature-event schedule.
    events = set()
    if cfg.print_exp and cfg.exp_thinned:
        events.update(t for t in reference_exp_times(cfg.niters)
                      if t <= cfg.niters)
    elif cfg.print_exp:
        events.update(exponential_print_steps(cfg.niters))
    elif cfg.print_freq:
        events.update(range(cfg.print_freq, cfg.niters + 1,
                            cfg.print_freq))
    temp_events = set()
    if cfg.temp_freq:
        temp_events.update(range(cfg.temp_freq, cfg.niters + 1,
                                 cfg.temp_freq))
    all_events = sorted(events | temp_events | {cfg.niters})

    m0 = self.measure()
    log(f"Initial magnetization: {m0['magnetization']:9.6f}, "
        f"up_s: {m0['up']:12d}, dw_s: {m0['down']:12d}")
    series = [(0, m0["magnetization"])]

    self.block()
    t0 = time.perf_counter()
    base = self.step  # absolute step after warmup; events count from here
    done = 0
    stopped_early = False
    for ev in all_events:
        self.advance(base + ev - self.step)
        done = ev
        if ev in events:
            self.block()
            mm = self.measure()
            series.append((ev, mm["magnetization"]))
            log(f"        magnetization: {mm['magnetization']:9.6f}, "
                f"up_s: {mm['up']:12d}, dw_s: {mm['down']:12d} "
                f"(iter: {ev:8d})")
            if cfg.corr_out:
                self._append_corr(ev)
            if cfg.dump_lattice:
                self._dump(ev)
            if cfg.tgt_magn is not None and \
                    abs(mm["magnetization"] - cfg.tgt_magn) \
                    < TGT_MAGN_MAX_DIFF:
                stopped_early = True
                break
        if ev in temp_events:
            new_t = max(MIN_TEMP, self.temp + cfg.temp_step)
            log(f"Changing temperature to {new_t:f}")
            self.set_temperature(new_t)
    self.block()
    elapsed = time.perf_counter() - t0

    mf = self.measure()
    log(f"Final   magnetization: {mf['magnetization']:9.6f}, "
        f"up_s: {mf['up']:12d}, dw_s: {mf['down']:12d} "
        f"(iter: {done:8d})")

    flips = cfg.nspins * done
    flips_ns = flips / (elapsed * 1e9) if elapsed > 0 else 0.0
    # Effective lattice traffic, computed like the reference: per color
    # phase read src + read dst + write dst (optimized/main.cu:1884-1890).
    bps = getattr(getattr(self, "backend", None), "bytes_per_spin", 1.0)
    bw = flips_ns * 3.0 * bps
    log(f"Kernel execution time for {done} update steps: "
        f"{elapsed * 1e3:E} ms, {flips_ns:.2f} flips/ns "
        f"(BW: {bw:.2f} GB/s)")
    return {"steps": done, "elapsed_s": elapsed, "flips_ns": flips_ns,
            "bw_gbs": bw, "magnetization": mf["magnetization"],
            "stopped_early": stopped_early, "series": series,
            "temp_final": self.temp, "alpha_unit": t_unit}

