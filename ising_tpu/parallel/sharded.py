"""Sharded (and single-device) step functions: shard_map slab decomposition.

Maps the reference's multi-GPU structure (row slabs, boundary-row halo,
bulk-synchronous color phases — optimized/main.cu:1762-1805) onto a 1-D
device mesh: each shard owns `nrows/ndev` rows of both color planes, halo
rows travel by `ppermute` before each color sweep, and the whole multi-step
loop is one jitted `fori_loop` with donated buffers (in-place XLA-side, the
analog of the reference's in-place kernel updates).

RNG counters are derived from *global* row indices (row0 = axis_index *
slab), so trajectories are bit-identical for any device count — the
generalization of the reference's --use-common-seed mode
(basic_python/ising_basic.py:50-52,158-168), made the default.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..constants import BLACK, WHITE
from .halo import ring_halo_rows
from .mesh import ROW_AXIS, make_mesh

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_sharded_stepper(cfg, backend, mesh=None, jplanes=None,
                         force_collectives=False):
    """Build (shardings, step_n) for the given config/backend.

    step_n(black, white, thr10, step0, n) runs n MC steps (n may be traced;
    distinct n values do NOT trigger recompilation) and returns the new
    planes. black/white are the backend's storage arrays, sharded P(rows)
    when cfg.ndev > 1.

    jplanes: optional ((j_up,j_dn,j_same,j_off) black, (...) white) disorder
    planes in backend storage layout, sharded like the lattice.

    force_collectives: route ndev == 1 through the full multi-device code
    path (shard_map over a 1-device mesh, ppermute halo, axis_index row
    offsets) — bit-identical output by the counter contract. Used to
    MEASURE the sharded stepper's fixed overhead on one real chip
    (PERF.md round 5), the one-chip datum behind the weak-scaling
    projection.
    """
    ndev = cfg.ndev
    collect = ndev > 1 or force_collectives

    use_fused = (not collect and jplanes is None
                 and hasattr(backend, "fusable")
                 and backend.fusable(cfg.nrows))

    # Halo/compute overlap: split each sweep into an interior slab (no halo
    # dependency) plus two BAND-row boundary bands that consume the
    # ppermuted rows, so XLA's scheduler can hide the collective-permute
    # behind the interior kernel. The reference's analog is its implicit
    # P2P pull of neighbor boundary rows during the kernel
    # (optimized/main.cu:1637-1642) — also latency-hidden, also pull-2-rows.
    # Bands are 8 rows (sublane-aligned, keeps every kernel's local-parity
    # and Mosaic full-tile assumptions; see PERF.md on sub-tile shapes).
    BAND = 8
    use_overlap = bool(getattr(cfg, "halo_overlap", False)) and ndev > 1
    if use_overlap:
        if cfg.local_rows < 4 * BAND:
            raise ValueError("halo_overlap needs local slab >= 32 rows")
        if cfg.xsl is not None:
            raise ValueError("halo_overlap is not supported in replica "
                             "mode (vertical wrap is sub-lattice-local)")
        if backend.name == "mxu":
            raise ValueError("halo_overlap unsupported for the mxu backend "
                             "(interior slab breaks its 128-row tiling)")

    def _slice_j(jp, a, b_end):
        return None if jp is None else tuple(p[a:b_end] for p in jp)

    def color_sweep_split(dst, src, halo_up, halo_dn, *, color, thr, step,
                          row0, jp):
        """Interior + two boundary bands; bit-identical to one full sweep
        (RNG counters are global-row-indexed, so splitting is free)."""
        H = dst.shape[0]
        mid = backend.update_color(
            dst[BAND:H - BAND], src[BAND:H - BAND], color=color, thr10=thr,
            step=step, row0=row0 + BAND, src_up=src[BAND - 1:BAND],
            src_dn=src[H - BAND:H - BAND + 1],
            jplanes=_slice_j(jp, BAND, H - BAND))
        top = backend.update_color(
            dst[:BAND], src[:BAND], color=color, thr10=thr, step=step,
            row0=row0, src_up=halo_up, src_dn=src[BAND:BAND + 1],
            jplanes=_slice_j(jp, 0, BAND))
        bot = backend.update_color(
            dst[H - BAND:], src[H - BAND:], color=color, thr10=thr,
            step=step, row0=row0 + H - BAND,
            src_up=src[H - BAND - 1:H - BAND], src_dn=halo_dn,
            jplanes=_slice_j(jp, H - BAND, H))
        return jnp.concatenate([top, mid, bot], axis=0)

    def shard_step(b, w, thr, step, jb, jw):
        if use_fused:
            # Single-device fast path: both color phases in one kernel
            # (reads each color plane once per step).
            return backend.update_step(b, w, thr10=thr, step=step)
        if collect:
            row0 = lax.axis_index(ROW_AXIS) * cfg.local_rows
        else:
            row0 = 0
        w_up, w_dn = ring_halo_rows(w, ROW_AXIS) if collect \
            else (w[-1:], w[:1])
        if use_overlap:
            b = color_sweep_split(b, w, w_up, w_dn, color=BLACK, thr=thr,
                                  step=step, row0=row0, jp=jb)
        else:
            b = backend.update_color(b, w, color=BLACK, thr10=thr, step=step,
                                     row0=row0, src_up=w_up, src_dn=w_dn,
                                     jplanes=jb)
        b_up, b_dn = ring_halo_rows(b, ROW_AXIS) if collect \
            else (b[-1:], b[:1])
        if use_overlap:
            w = color_sweep_split(w, b, b_up, b_dn, color=WHITE, thr=thr,
                                  step=step, row0=row0, jp=jw)
        else:
            w = backend.update_color(w, b, color=WHITE, thr10=thr, step=step,
                                     row0=row0, src_up=b_up, src_dn=b_dn,
                                     jplanes=jw)
        return b, w

    def loop(b, w, thr, step0, n, jb, jw):
        def body(i, carry):
            bb, ww = carry
            return shard_step(bb, ww, thr, step0 + i.astype(jnp.uint32), jb, jw)
        return lax.fori_loop(0, n, body, (b, w))

    if collect:
        if mesh is None:
            mesh = make_mesh(ndev)
        row_sharded = NamedSharding(mesh, P(ROW_AXIS, None))
        repl = NamedSharding(mesh, P())
        plane_spec = P(ROW_AXIS, None)
        # Disorder planes shard like the lattice; match each backend's
        # jplane tuple arity (4 bit planes, or 1 packed word for "packed").
        jspec = P() if jplanes is None else \
            tuple(plane_spec for _ in jplanes[0])
        inner = shard_map(
            loop, mesh=mesh,
            in_specs=(plane_spec, plane_spec, P(), P(), P(), jspec, jspec),
            out_specs=(plane_spec, plane_spec),
            check_vma=False)
        shardings = {"plane": row_sharded, "replicated": repl, "mesh": mesh}
    else:
        inner = loop
        shardings = {"plane": None, "replicated": None, "mesh": None}

    jb, jw = (None, None) if jplanes is None else jplanes
    if collect and jb is not None:
        # Pre-shard once so the per-call argument passing below never
        # re-transfers them.
        jb = jax.device_put(jb, row_sharded)
        jw = jax.device_put(jw, row_sharded)

    # The disorder planes are passed as ARGUMENTS, not closure captures:
    # closed-over arrays are embedded as literal constants at lowering
    # time (a 2+ GB program at 65536^2, which wedges compilation) instead
    # of staying device-resident buffers.
    @partial(jax.jit, donate_argnums=(0, 1))
    def _step_n(black, white, thr10, step0, n, jba, jwa):
        return inner(black, white, thr10, step0, n, jba, jwa)

    def step_n(black, white, thr10, step0, n):
        return _step_n(black, white, thr10, step0, n, jb, jw)

    # Composition hooks: the UNJITTED loop plus the disorder-plane
    # arguments it needs, so callers can inline this stepper into a larger
    # jitted program (parallel tempering unrolls K rungs' loops into ONE
    # dispatch per swap round — see tempering.py). raw has the same
    # signature as the jitted core: (b, w, thr10, step0, n, jb, jw).
    step_n.raw = inner
    step_n.jargs = (jb, jw)

    return shardings, step_n
