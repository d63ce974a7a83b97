"""2-D block decomposition probe: (rows, cols) mesh, column-halo ppermute.

SURVEY.md §7.5 deferred "slab (later 2-D block) sharding"; this module is
the design probe that settles it. The verdict (measured/modeled numbers in
PERF.md "2-D block decomposition: go/no-go") is NO-GO for production at
reference scales — 1-D row slabs stay the shipped path — for two reasons
this prototype makes concrete:

1. **The frozen counter->column contract prices column sharding at LANES x
   redundant RNG generation.** Every counter-rng draw call emits LANES
   output words per counter, laid out lane-CONCAT across the global row
   (rng.color_draws: col j of a CH-wide row = output[j // (CH/LANES)] of
   quad j % (CH/LANES); LANES = 4 philox / 2 threefry / 16 chacha — the
   layout Mosaic forces, since lane-interleaving reshapes are unsupported
   on TPU). A width-Cl column block therefore needs counters whose OTHER
   lane outputs land outside the block: it must generate LANES*Cl words to
   keep Cl (`draws_block` below selects the surviving lane with a traced
   dynamic index). In the reproducible modes, generation is 60-80% of
   kernel time (PERF.md roofline), so column sharding forfeits most of its
   compute scaling — while 1-D slabs shard generation perfectly (counters
   are global-row-indexed).

2. **Halo cost at scale is ppermute LATENCY, not volume, and 2-D doubles
   the latency.** Per color phase, 1-D moves one boundary row each way
   (ncols/16 bytes in bit1 — 4 KB at 65536^2); 2-D moves a shorter row
   PLUS one boundary column, i.e. two dependent ppermute phases. Volumes
   are microseconds-irrelevant against ICI bandwidth at every reference
   shape, so the perimeter-vs-width volume argument for 2-D never engages;
   the extra collective phase is pure loss.

1-D capacity runs out only when nrows/ndev < 32 (the halo_overlap minimum
slab; 8 without overlap) — 2048 devices for the reference's largest-lattice
rows — far beyond the reference's 8-GPU scale and any pod this framework
has access to. If that regime ever matters, the note in PERF.md records the
escape hatch: an opt-in v3 draw contract with quad-local lane layout.

What this prototype DOES establish (and tests lock in,
tests/test_block2d.py): the column-halo mechanics are sound, and
bit-identical-to-1-device trajectories survive 2-D sharding under the
existing contract for every counter rng family. Reference scope: the
reference is 1-D-only (optimized/main.cu:1602-1658, Y-slabs over GPUs).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..constants import BLACK, WHITE
from ..rng import (TAG_SWEEP, chacha_block, key_from_seed, mulhilo32,
                   parse_rng_mode, philox4x32, threefry2x32,
                   threefry_stream_key)
from .halo import ring_halo_rows

try:  # jax >= 0.6
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

ROW_AXIS2D = "rows"
COL_AXIS2D = "cols"

_LANES = {"philox": 4, "threefry": 2, "chacha": 16}


def make_mesh2d(nrow_shards: int, ncol_shards: int, devices=None) -> Mesh:
    """(rows, cols) device mesh for 2-D block decomposition."""
    if devices is None:
        devices = jax.devices()
    n = nrow_shards * ncol_shards
    if n > len(devices):
        raise ValueError(f"mesh {nrow_shards}x{ncol_shards} needs {n} "
                         f"devices, only {len(devices)} present")
    return Mesh(np.array(devices[:n]).reshape(nrow_shards, ncol_shards),
                (ROW_AXIS2D, COL_AXIS2D))


def _u32(x):
    return jnp.asarray(x, jnp.uint32) if hasattr(x, "astype") \
        else jnp.uint32(x)


def _block_counters(nrows: int, m: int, row0, q0, stride: int):
    """64-bit counters c = y*stride + q for quads [q0, q0+m) of rows
    [row0, row0+nrows) — quad_counters with a (possibly traced) quad
    offset, same carry discipline."""
    y = lax.broadcasted_iota(jnp.uint32, (nrows, m), 0) + _u32(row0)
    q = lax.broadcasted_iota(jnp.uint32, (nrows, m), 1) + _u32(q0)
    hi, lo = mulhilo32(y, jnp.uint32(stride))
    c0 = lo + q
    c1 = hi + (c0 < lo).astype(jnp.uint32)
    return c0, c1


def draws_block(mode: str, seed: int, nrows: int, ncl: int, *, step,
                tag: int, row0, col0, ch_global: int):
    """Draws for the compact-column block [col0, col0+ncl) of rows
    [row0, row0+nrows), BIT-IDENTICAL to columns [col0, col0+ncl) of the
    full-row `counter_color_draws` output.

    col0/row0 may be traced (axis_index-derived). col0 must be a multiple
    of ncl (a uniform column partition) — with ncl dividing the lane-group
    width g, that guarantees a block never straddles a lane-group boundary
    (a traced col0 cannot be validated at trace time). This is where the
    frozen contract's lane-concat layout exacts its price: LANES output
    words are generated per kept word (the module docstring's no-go
    reason #1).
    """
    family, rounds = parse_rng_mode(mode)
    if family not in _LANES:
        raise NotImplementedError(
            "2-D block draws cover the u32 counter contracts only "
            "(philox/threefry/chacha); hw and bit-plane ...b modes are "
            "out of the prototype's scope")
    lanes = _LANES[family]
    if ch_global % lanes:
        raise ValueError(f"{family} needs compact width % {lanes} == 0")
    g = ch_global // lanes  # counters per global row == lane-group width

    if family == "philox":
        k0, k1 = key_from_seed(seed)
        gen = lambda c0, c1: philox4x32(c0, c1, _u32(step), _u32(tag),
                                        k0, k1, rounds)
    elif family == "threefry":
        k0, k1 = threefry_stream_key(seed, step, tag)
        gen = lambda c0, c1: threefry2x32(c0, c1, k0, k1, rounds)
    else:
        k0, k1 = key_from_seed(seed)
        gen = lambda c0, c1: chacha_block(c0, c1, _u32(step), _u32(tag),
                                          k0, k1, rounds)

    col0 = _u32(col0)
    if ncl <= g:
        # Block inside one lane group: counters [col0 mod g, + ncl), keep
        # the (traced) lane col0 // g.
        if g % ncl:
            raise ValueError(
                f"column block width {ncl} must divide the lane-group "
                f"width {g} (= compact width / {lanes} for {family})")
        c0, c1 = _block_counters(nrows, ncl, row0, col0 % jnp.uint32(g), g)
        outs = jnp.stack(gen(c0, c1))  # (lanes, nrows, ncl)
        return lax.dynamic_index_in_dim(outs, (col0 // jnp.uint32(g))
                                        .astype(jnp.int32), 0,
                                        keepdims=False)
    # Block spans k whole lane groups: generate the full counter row once,
    # keep lanes lane0..lane0+k-1.
    if ncl % g:
        raise ValueError(
            f"column block width {ncl} must be a multiple of the "
            f"lane-group width {g} for {family}")
    k = ncl // g
    c0, c1 = _block_counters(nrows, g, row0, 0, g)
    outs = jnp.stack(gen(c0, c1))  # (lanes, nrows, g)
    lane0 = (col0 // jnp.uint32(g)).astype(jnp.int32)
    parts = [lax.dynamic_index_in_dim(outs, lane0 + j, 0, keepdims=False)
             for j in range(k)]
    return jnp.concatenate(parts, axis=1)


def _ring_halo_cols(src, axis_name: str):
    """(left_halo, right_halo), each (H, 1): neighboring blocks' edge
    columns — the column-axis twin of halo.ring_halo_rows."""
    n = lax.axis_size(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left = lax.ppermute(src[:, -1:], axis_name, fwd)
    right = lax.ppermute(src[:, :1], axis_name, bwd)
    return left, right


def make_block2d_stepper(cfg, backend, mesh):
    """(shardings, step_n) over a (rows, cols) mesh — xla backend, u32
    counter rng modes, no disorder/replica (prototype scope; see module
    docstring for why this is not the production path)."""
    from ..ops.xla_ref import sweep_color

    if backend.name != "xla":
        raise NotImplementedError("block2d prototype drives the xla "
                                  "backend only")
    if cfg.xsl is not None or cfg.j_prob is not None:
        raise NotImplementedError("block2d prototype: no replica/disorder")
    if cfg.field != 0.0:
        # sweep_color below uses the mirror-symmetric select (h = 0 only);
        # silently wrong dynamics otherwise.
        raise NotImplementedError("block2d prototype: no external field")
    R, C = mesh.devices.shape
    ch = cfg.ncols // 2
    if cfg.nrows % R or (cfg.nrows // R) % 2:
        raise ValueError("nrows must split into even-height row blocks")
    if ch % C:
        raise ValueError("compact width must split evenly across columns")
    hl, cl = cfg.nrows // R, ch // C

    def shard_step(b, w, thr, step):
        row0 = lax.axis_index(ROW_AXIS2D) * hl
        col0 = lax.axis_index(COL_AXIS2D) * cl

        def half(dst, src, color):
            s_up, s_dn = ring_halo_rows(src, ROW_AXIS2D)
            s_l, s_r = _ring_halo_cols(src, COL_AXIS2D)
            draws = draws_block(cfg.rng, cfg.seed, hl, cl, step=step,
                                tag=TAG_SWEEP | color, row0=row0,
                                col0=col0, ch_global=ch)
            return sweep_color(dst, src, color=color, thr10=thr,
                               draws=draws, src_up=s_up, src_dn=s_dn,
                               src_left=s_l, src_right=s_r)

        b = half(b, w, BLACK)
        w = half(w, b, WHITE)
        return b, w

    def loop(b, w, thr, step0, n):
        def body(i, carry):
            bb, ww = carry
            return shard_step(bb, ww, thr, step0 + i.astype(jnp.uint32))
        return lax.fori_loop(0, n, body, (b, w))

    plane_spec = P(ROW_AXIS2D, COL_AXIS2D)
    inner = shard_map(loop, mesh=mesh,
                      in_specs=(plane_spec, plane_spec, P(), P(), P()),
                      out_specs=(plane_spec, plane_spec), check_vma=False)
    shardings = {"plane": NamedSharding(mesh, plane_spec),
                 "replicated": NamedSharding(mesh, P()), "mesh": mesh}
    step_n = jax.jit(inner, donate_argnums=(0, 1))
    return shardings, step_n
