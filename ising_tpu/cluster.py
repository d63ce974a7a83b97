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
    inside ONE lax.while_loop that exits when labels stop changing,
    composing three monotone contractions (see label_clusters): the
    stencil min (rolls+selects), segmented row/column min-scans that move
    labels across whole straight open-bond runs per iteration
    (associative scans — log-depth shifts), and a pointer-jumping pass
    (label <- label[label], one gather). Measured at Tc equilibrium the
    composition converges in ~34-54 iterations at L=256-1024 (nearly
    size-stable) vs the stencil's O(cluster diameter) ~ 2L; even that
    bound beats Metropolis asymptotically at Tc (O(L) cheap iterations
    per decorrelation vs O(L^2.17) full sweeps).
  * Cluster flip: every site draws the SAME coin as its cluster root —
    one elementwise Threefry of the root id under a per-step stream key.
    No per-cluster lists ever materialize.

Scope (fenced in __init__): ferromagnetic J = +1 (frustrated +-J has no
FK representation). Full-lattice wrap or sub-lattice replica mode
(cfg.xsl/ysl — many independent periodic tiles per plane,
sw_step_replica; single-device). A uniform field is supported through
the ghost-spin construction (sw_step); multi-device full-wrap runs
shard rows and stay bit-identical to 1 device (GSPMD handles the
halo/gather collectives, the Pallas labeler rides shard_map).

Wolff is deliberately absent: single-cluster Wolff is exactly "label the
FK clusters, flip the one containing a uniform random site" — on a
serial machine it wins by touching one cluster, but here the labeling is
a whole-lattice data-parallel pass either way, so Swendsen-Wang (flip
EVERY cluster for the same labeling cost) strictly dominates on TPU.

Labels are int32 site ids, so nrows * ncols < 2^31. State is the full
(Y, X) uint8 bit lattice — the working regime is "fits decoded", i.e.
anything up to ~2^30 spins; the Metropolis tiers remain the
giant-lattice path.
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


def bond_threshold(temp: float, coupling: float = 1.0) -> int:
    """uint32 open-bond threshold: open <=> draw <= thr,
    p = 1 - exp(-2*coupling/T) (coupling = J for spin-spin bonds, |h| for
    the ghost bonds of a uniform field).

    T <= 0 degenerates to p = 1 (every aligned pair bonds: clusters are
    the geometric domains). Host-side float64, like ising.threshold_table.
    """
    p = 1.0 if temp <= 0 else 1.0 - math.exp(-2.0 * coupling / temp)
    return int(np.rint(min(p, 1.0) * 4294967295.0))


def open_bonds(full, draws_r, draws_d, thr):
    """(open_r, open_d) bool planes: bond (y,x)-(y,x+1) / (y,x)-(y+1,x)
    open. A bond can only open between ALIGNED spins (FK representation);
    the draw compare is a raw u32 <= threshold."""
    t = jnp.uint32(thr)
    open_r = (full == jnp.roll(full, -1, axis=1)) & (draws_r <= t)
    open_d = (full == jnp.roll(full, -1, axis=0)) & (draws_d <= t)
    return open_r, open_d


def _stencil_min(lab, open_r, open_d):
    """One periodic 4-direction min-pull of labels across open bonds.
    Own label stays in the min (labels are monotone non-increasing —
    without it a cluster minimum with all four bonds open would LOSE its
    label and the fixpoint loop could cycle). Shared by every labeler so
    the bond convention lives in exactly one place."""
    l_r = jnp.where(open_r, jnp.roll(lab, -1, axis=1), lab)
    l_l = jnp.where(jnp.roll(open_r, 1, axis=1),
                    jnp.roll(lab, 1, axis=1), lab)
    l_d = jnp.where(open_d, jnp.roll(lab, -1, axis=0), lab)
    l_u = jnp.where(jnp.roll(open_d, 1, axis=0),
                    jnp.roll(lab, 1, axis=0), lab)
    return jnp.minimum(lab, jnp.minimum(jnp.minimum(l_r, l_l),
                                        jnp.minimum(l_d, l_u)))


def _seg_min_op(a, b):
    """Associative segmented-min: (running min, segment-open-through)."""
    (m1, a1), (m2, a2) = a, b
    return jnp.where(a2, jnp.minimum(m1, m2), m2), a1 & a2


def _seg_scan_axis(lab, open_fwd, axis: int):
    """Min-label propagation along WHOLE open-bond runs of one axis, both
    directions, as two associative scans (log-depth shifts — no gathers).
    Non-periodic: the wrap bond is covered by the stencil step; since the
    iteration is a monotone min converging to a fixpoint, skipping wrap
    here costs at most extra iterations, never correctness."""
    gate_f = jnp.roll(open_fwd, 1, axis=axis)  # bond (i-1, i), forward
    mf, _ = lax.associative_scan(_seg_min_op, (lab, gate_f), axis=axis)
    rev = lambda x: jnp.flip(x, axis=axis)
    mb, _ = lax.associative_scan(_seg_min_op, (rev(lab), rev(open_fwd)),
                                 axis=axis)
    return jnp.minimum(mf, rev(mb))


def label_clusters(open_r, open_d, *, scans: bool = True, jumps: int = 1,
                   return_iters: bool = False):
    """int32 (Y, X) plane of per-site cluster labels (= min site id of the
    connected component under the open bonds, periodic in both axes).

    One lax.while_loop that exits when labels stop changing (guaranteed:
    labels are monotone non-increasing, bounded by the cluster min). Each
    iteration composes three monotone contractions, all converging to the
    SAME fixpoint — the static flags only trade iteration count against
    per-iteration cost:

      * stencil min: pull labels across every open bond (rolls+selects —
        the cheap baseline; alone it needs O(cluster diameter) ~ 2L
        iterations at Tc, measured 299/298/466 at L=256/512/1024);
      * segmented row+column scans (scans=True): propagate along whole
        straight open-bond runs via associative scans (log-depth shifts);
      * pointer jumps (jumps=k): label <- label[label], one O(N) gather
        each, collapsing already-built label chains.

    Measured iteration counts at Tc equilibrium (CPU, = TPU: same math):
    scans+1 jump 54/35/34 at L=256/512/1024 — essentially size-stable —
    vs hundreds for the pure stencil. CPU wall time favors the pure
    stencil below L~1024 (gathers/scans are expensive there); the default
    is the asymptotically safe scans+jump — benchmark on your target with
    scripts/experiments/bench_cluster.py before tuning."""
    Y, X = open_r.shape
    ids = jnp.arange(Y * X, dtype=jnp.int32).reshape(Y, X)

    def body(state):
        lab, _, k = state
        new = _stencil_min(lab, open_r, open_d)
        if scans:
            new = jnp.minimum(new, _seg_scan_axis(new, open_r, 1))
            new = jnp.minimum(new, _seg_scan_axis(new, open_d, 0))
        for _ in range(jumps):
            # new[i] is a same-cluster site id <= i, so chasing it one
            # hop stays in-cluster and is monotone.
            new = jnp.take(new.reshape(-1), new)
        return new, jnp.any(new != lab), k + 1

    lab, _, iters = lax.while_loop(lambda s: s[1], body,
                                   (ids, jnp.asarray(True), jnp.int32(0)))
    return (lab, iters) if return_iters else lab


def _local_pass_kernel(lab_ref, o_r_ref, o_d_ref, out_ref, *, ty, tx):
    """Tile-local min-label fixpoint, entirely in VMEM.

    Pulls labels across open bonds whose BOTH endpoints live in this
    (ty, tx) tile (edge-crossing bonds are masked off — the outer global
    stencil step carries those plus the periodic wrap), iterating until
    the tile stops changing. Monotone min => converges; any iteration
    count is trajectory-safe, the outer while_loop owns the global
    fixpoint. The payoff: one HBM read/write per PASS instead of per
    stencil iteration — a label crosses the whole tile per pass instead
    of one site per global iteration."""
    from jax.experimental.pallas import tpu as pltpu  # lazy (CPU import ok)

    lab0 = lab_ref[...]
    # Bonds arrive as int8 (4x less HBM than int32 planes); widen before
    # ANY vector op — Mosaic has no i8 vector ALU.
    o_r = o_r_ref[...].astype(jnp.int32)
    o_d = o_d_ref[...].astype(jnp.int32)
    lane = lax.broadcasted_iota(jnp.int32, (ty, tx), 1)
    sub = lax.broadcasted_iota(jnp.int32, (ty, tx), 0)
    # Gate g_X: site may pull its X-neighbor's label (bond open, interior).
    # int32 masks: Mosaic vector ALU has no i8; bool vregs are fine but
    # the doubling chain rolls them, and rolling i32 keeps one layout.
    g_r = ((o_r > 0) & (lane < tx - 1)).astype(jnp.int32)
    g_l = ((pltpu.roll(o_r, 1, 1) > 0) & (lane > 0)).astype(jnp.int32)
    g_d = ((o_d > 0) & (sub < ty - 1)).astype(jnp.int32)
    g_u = ((pltpu.roll(o_d, 1, 0) > 0) & (sub > 0)).astype(jnp.int32)
    big = jnp.int32(0x7FFFFFFF)

    def chain(lab, gate1, axis, size, back, cap=16):
        """Gated distance-doubling min-pull (segmented min-scan,
        Hillis-Steele): after step d the label has crossed any open run
        of length 2d in this direction. Tile edges stay sealed: gate1 is
        False at the edge lane/sublane, and every doubled gate ANDs a
        chain of gate1's through it, so wrapped rolls never contribute.

        Capped at distance `cap`: open runs of length d occur with
        probability p^d (p = 0.585 at Tc, 0.93 deep in the ordered
        phase), so distances past ~16 almost never fire, while each
        extra step costs vector ops AND register pressure (uncapped
        chains at 512x1024 tiles spilled 90 MB and OOM'd vmem). Longer
        runs still resolve — across iterations, monotonically.

        back=False pulls from lower indices (roll +d), back=True from
        higher (roll size-d)."""
        cand, g, d = lab, gate1, 1
        while d < min(size, cap):
            sh = d if not back else size - d
            cand = jnp.minimum(
                cand, jnp.where(g > 0, pltpu.roll(cand, sh, axis), big))
            g = g & pltpu.roll(g, sh, axis)
            d *= 2
        return cand

    def pull(lab):
        """One inner relaxation: full-run propagation along rows then
        columns, both directions. Monotone min over in-cluster sites."""
        n = chain(lab, g_l, 1, tx, False)
        n = jnp.minimum(n, chain(lab, g_r, 1, tx, True))
        n = chain(n, g_u, 0, ty, False)
        return jnp.minimum(n, chain(n, g_d, 0, ty, True))

    first = pull(lab0)

    def body(state):
        lab, _ = state
        new = pull(lab)
        return new, jnp.any(new != lab)

    lab, _ = lax.while_loop(lambda s: s[1], body,
                            (first, jnp.any(first != lab0)))
    out_ref[...] = lab


def _pick_tile(Y: int, X: int):
    """(ty, tx) VMEM tile for the local pass, or None if the shape
    doesn't fit the layout rules (lane dim multiple of 128, sublane
    multiple of 8). ~0.5 MB int32 planes: the kernel keeps ~a dozen
    planes live (labels, gates, chain carries) and Mosaic's register
    allocator needs the headroom — 2 MB planes spilled and OOM'd.
    ty below int8's native 32-sublane tile is fine: verified compiled
    on v5e at (8, 512) and (16, 512) blocks, bit-equal to the
    stencil."""
    tx = next((t for t in (512, 256, 128) if X % t == 0), None)
    if tx is None:
        return None
    cap = (1 << 19) // (4 * tx)  # rows for a 0.5 MB int32 plane
    ty = next((t for t in (256, 128, 64, 32, 16, 8)
               if t <= cap and Y % t == 0), None)
    return None if ty is None else (ty, tx)


def label_clusters_tiled(open_r, open_d, *, return_iters: bool = False,
                         interpret: bool | None = None, mesh=None):
    """label_clusters, restructured for the TPU memory hierarchy.

    Same min-site-id fixpoint (asserted against union-find in
    tests/test_cluster.py), different iteration economy: the global
    stencil moves labels one site per HBM round trip, so at Tc its
    iteration count ~ cluster path length ~ L^1.13 with ~10 plane reads
    each (measured 1.06 ms/iter x 2343 iters at L=4096). Here each outer
    iteration is one global stencil step (cross-tile bonds + periodic
    wrap) followed by a Pallas pass that converges every (ty, tx) tile
    IN VMEM — labels cross a whole tile per outer iteration, so the
    outer count drops to ~ tiles-crossed-by-the-longest-path and HBM
    traffic drops by the local iteration count. Falls back to
    label_clusters when the shape has no legal tile.

    mesh: a 1-D row mesh for multi-device runs — the Pallas pass runs
    per-shard under shard_map (tiles are chosen to align with the shard
    boundary, so no tile straddles devices), while the global stencil's
    rolls stay GSPMD-partitioned (collective permutes carry the
    cross-shard and wrap bonds). Bit-identical to the single-device
    labeling by the fixpoint argument."""
    Y, X = open_r.shape
    ndev = 1 if mesh is None else mesh.devices.size
    tile = _pick_tile(Y // ndev, X)
    if tile is None:
        return label_clusters(open_r, open_d, scans=False, jumps=0,
                              return_iters=return_iters)
    ty, tx = tile
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    o_r8 = open_r.astype(jnp.int8)
    o_d8 = open_d.astype(jnp.int8)
    blk = lambda i, j: (i, j)
    spec = pl.BlockSpec((ty, tx), blk, memory_space=pltpu.VMEM)
    local = pl.pallas_call(
        functools.partial(_local_pass_kernel, ty=ty, tx=tx),
        grid=(Y // ndev // ty, X // tx),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Y // ndev, X), jnp.int32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        from .parallel.mesh import ROW_AXIS
        rows = P(ROW_AXIS, None)
        kw = dict(mesh=mesh, in_specs=(rows, rows, rows), out_specs=rows)
        try:
            # check_vma=False: pallas_call's out_shape carries no
            # varying-mesh-axes annotation; the map is per-shard anyway.
            local = jax.shard_map(local, check_vma=False, **kw)
        except AttributeError:  # pragma: no cover — older jax
            from jax.experimental.shard_map import shard_map
            local = shard_map(local, check_rep=False, **kw)

    ids = jnp.arange(Y * X, dtype=jnp.int32).reshape(Y, X)

    def body(state):
        lab, _, k = state
        # Global stencil step: the only mover across tile edges + wrap.
        new = local(_stencil_min(lab, open_r, open_d), o_r8, o_d8)
        return new, jnp.any(new != lab), k + 1

    # First pass before the loop: tiles converge locally from raw ids
    # (the bulk of the work), so the while body's tiles start hot.
    lab0 = local(ids, o_r8, o_d8)
    lab, _, iters = lax.while_loop(
        lambda s: s[1], body, (lab0, jnp.asarray(True), jnp.int32(1)))
    return (lab, iters) if return_iters else lab


def cluster_coins(labels, seed: int, step):
    """uint8 (Y, X) flip mask: bit 31 of Threefry(root id) under the
    per-(step, TAG_CLUSTER|2) stream key — all sites of a cluster draw
    the SAME coin because they share the root id."""
    k0, k1 = threefry_stream_key(seed, step, TAG_CLUSTER | 2)
    x0, _ = threefry2x32(labels.astype(jnp.uint32),
                         jnp.zeros_like(labels, jnp.uint32), k0, k1, 13)
    return (x0 >> 31).astype(jnp.uint8)


def ghost_bonded_clusters(labels, ghost):
    """uint8 (Y, X): 1 where the site's cluster contains ANY ghost-bonded
    site. One scatter-max onto the root ids, one gather back — the
    whole-cluster OR without per-cluster lists."""
    flat = labels.reshape(-1)
    per_root = jnp.zeros(flat.shape, jnp.uint8).at[flat].max(
        ghost.reshape(-1).astype(jnp.uint8))
    return jnp.take(per_root, labels)


def sw_step(full, thr, seed: int, step, *, field: float = 0.0,
            thr_ghost=None, tiled: bool | None = None, mesh=None):
    """One Swendsen-Wang update of the full (Y, X) uint8 bit lattice.

    A uniform field enters through the standard ghost-spin construction:
    every site whose spin aligns with sign(h) bonds to a fixed virtual
    ghost spin with p = 1 - exp(-2|h|/T) (thr_ghost); clusters attached
    to the ghost keep their orientation, all others flip by their root's
    coin. h = 0 reduces to the plain algorithm (no ghost stream drawn).

    tiled: force the Pallas VMEM labeler on (True) / off (False);
    None = platform default. Multi-device callers pass their row mesh —
    the Pallas pass then runs per-shard under shard_map (GSPMD cannot
    partition a raw pallas_call). Every labeler reaches the identical
    fixpoint, so these choices never touch trajectories.
    """
    Y, X = full.shape
    draws_r = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 0,
                          row_stride=X)
    draws_d = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 1,
                          row_stride=X)
    open_r, open_d = open_bonds(full, draws_r, draws_d, thr)
    # Contraction choice is PLATFORM-tuned (trajectory-neutral: every
    # variant converges to the same min-label fixpoint, asserted in
    # tests/test_cluster.py). On TPU the Pallas tiled labeler wins at
    # every measured size (1.2x/1.7x/9.4x/17.5x the pure stencil at
    # L=1024/2048/4096/8192, PERF.md round 5 — VMEM-local run-doubling
    # vs one-site-per-HBM-pass propagation); the stencil backs it up
    # for un-tileable shapes, and
    # scan/gather variants lose outright on chip (a scan+gather
    # iteration costs 130-450x a roll/min one, and the scan program's
    # compile time explodes — 1348 s at L=2048). On CPU the scans'
    # near-size-stable iteration count dominates above ~2^16 spins.
    # Measured: PERF.md round 5 + scripts/experiments/exp_label_xover.py.
    if tiled is None:
        tiled = jax.devices()[0].platform != "cpu"
    if tiled:
        labels = label_clusters_tiled(open_r, open_d, mesh=mesh)
    elif jax.devices()[0].platform == "cpu":
        labels = label_clusters(open_r, open_d, scans=Y * X >= 65536)
    else:
        labels = label_clusters(open_r, open_d, scans=False, jumps=0)
    flip = cluster_coins(labels, seed, step)
    if field != 0.0:
        draws_g = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 3,
                              row_stride=X)
        aligned = full == jnp.uint8(1 if field > 0 else 0)
        ghost = aligned & (draws_g <= jnp.uint32(thr_ghost))
        flip = flip & (1 - ghost_bonded_clusters(labels, ghost))
    return full ^ flip


def sw_step_replica(full, thr, seed: int, step, *, xsl: int, ysl: int,
                    field: float = 0.0, thr_ghost=None):
    """One Swendsen-Wang update of many independent (ysl, xsl) replicas
    packed into one (Y, X) plane — the reference's sub-lattice replica
    mode (optimized/README.md:143-199, periodic WITHIN each tile)
    married to the cluster algorithm (no reference analog).

    Bond draws use the same global-position counter streams as sw_step,
    so each replica's trajectory is a pure function of (seed, step,
    tile position) — reproducible across device counts like everything
    else. Bonds wrap within their replica (tile_roll), replicas batch
    onto a leading axis for the vmapped labeling, and root ids are
    globalized (+ replica * ysl * xsl) so every replica's clusters draw
    independent coins from the shared streams. A uniform field uses the
    same ghost construction per replica (root-id scatter-max is already
    replica-safe under global ids)."""
    Y, X = full.shape
    nry, nrx = Y // ysl, X // xsl
    draws_r = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 0,
                          row_stride=X)
    draws_d = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 1,
                          row_stride=X)

    def tile_roll(a, axis):
        # within-replica periodic "next" neighbor along axis
        if axis == 1:
            return jnp.roll(a.reshape(Y, nrx, xsl), -1, axis=2
                            ).reshape(Y, X)
        return jnp.roll(a.reshape(nry, ysl, X), -1, axis=1).reshape(Y, X)

    t = jnp.uint32(thr)
    open_r = (full == tile_roll(full, 1)) & (draws_r <= t)
    open_d = (full == tile_roll(full, 0)) & (draws_d <= t)

    def to_batch(a):
        return (a.reshape(nry, ysl, nrx, xsl).transpose(0, 2, 1, 3)
                .reshape(nry * nrx, ysl, xsl))

    def from_batch(a):
        return (a.reshape(nry, nrx, ysl, xsl).transpose(0, 2, 1, 3)
                .reshape(Y, X))

    # Replica graphs are standard periodic (ysl, xsl) graphs; vmap the
    # roll-based labeler (the Pallas tiled labeler has no batching rule,
    # and replicas are small by construction — gathers stay off the hot
    # path with jumps=0 on accelerators).
    on_cpu = jax.devices()[0].platform == "cpu"
    lab_b = jax.vmap(lambda a, b: label_clusters(
        a, b, scans=on_cpu and ysl * xsl >= 65536, jumps=0))(
            to_batch(open_r), to_batch(open_d))
    rep = jnp.arange(nry * nrx, dtype=jnp.int32)[:, None, None]
    lab_b = lab_b + rep * jnp.int32(ysl * xsl)
    flip = cluster_coins(lab_b, seed, step)
    if field != 0.0:
        draws_g = color_draws(seed, Y, X, step=step, tag=TAG_CLUSTER | 3,
                              row_stride=X)
        aligned = to_batch(full) == jnp.uint8(1 if field > 0 else 0)
        ghost = aligned & (to_batch(draws_g) <= jnp.uint32(thr_ghost))
        flip = flip & (1 - ghost_bonded_clusters(lab_b, ghost))
    return full ^ from_batch(flip)


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
        if cfg.xsl is not None and cfg.ndev > 1:
            raise ValueError("replica cluster updates are single-device "
                             "(the replica batch transpose has no "
                             "sharded path yet); drop --devs or xsl/ysl")
        if cfg.nrows * cfg.ncols >= 2 ** 31:
            raise ValueError("labels are int32 site ids: needs "
                             "nrows * ncols < 2^31")
        self.cfg = cfg
        self.temp = cfg.temperature
        self.step = int(step0)
        if state is None:
            state = init_bits(cfg.seed, cfg.nrows, cfg.ncols)
        self.full = jnp.asarray(compact_to_full(*state))
        if cfg.ndev > 1:
            # Row-shard the plane; every op in sw_step is GSPMD-
            # transparent (rolls/scans lower to collective permutes, the
            # jump gather to an all-gather — fine at decoded-plane scale)
            # and trajectories are bit-identical to 1 device
            # (tests/test_cluster.py).
            from jax.sharding import NamedSharding, PartitionSpec
            from .parallel.mesh import ROW_AXIS, make_mesh
            self._mesh = make_mesh(cfg.ndev)
            self.full = jax.device_put(
                self.full, NamedSharding(self._mesh,
                                         PartitionSpec(ROW_AXIS, None)))
        else:
            self._mesh = None
        self._set_thresholds()
        self._build_step()

    def _set_thresholds(self):
        self._thr = jnp.uint32(bond_threshold(self.temp))
        self._thr_ghost = jnp.uint32(
            bond_threshold(self.temp, abs(self.cfg.field)))

    def _build_step(self):
        # Only the SIGN of h is trace-time (it selects the ghost
        # alignment); its magnitude rides in the traced ghost threshold,
        # so field scans at fixed sign never recompile.
        h = self.cfg.field
        sgn = 1.0 if h > 0 else (-1.0 if h < 0 else 0.0)
        # Sharded runs pass the row mesh: the Pallas labeler then runs
        # per-shard under shard_map (GSPMD cannot partition a raw
        # pallas_call), while the global stencil's rolls stay
        # GSPMD-partitioned. Same fixpoint on every path, so
        # trajectories are identical by construction.
        if self.cfg.xsl is not None:
            xsl, ysl = self.cfg.xsl, self.cfg.ysl
            self._step_jit = jax.jit(
                lambda f, t, tg, s: sw_step_replica(
                    f, t, self.cfg.seed, s, xsl=xsl, ysl=ysl,
                    field=sgn, thr_ghost=tg))
        else:
            self._step_jit = jax.jit(
                lambda f, t, tg, s: sw_step(f, t, self.cfg.seed, s,
                                            field=sgn, thr_ghost=tg,
                                            mesh=self._mesh))

    def set_temperature(self, temp: float):
        self.temp = float(temp)
        self._set_thresholds()

    def set_field(self, field: float):
        """Change h mid-run; recompiles only when sign(h) changes (the
        ghost alignment is a trace-time constant). Config validation
        (xla + u32 rng) reuses SimConfig's via dataclasses.replace."""
        import dataclasses
        old = self.cfg.field
        if float(field) == old:
            return
        self.cfg = dataclasses.replace(self.cfg, field=float(field))
        self._set_thresholds()
        if (field > 0, field < 0) != (old > 0, old < 0):
            self._build_step()

    def advance(self, nsteps: int):
        for _ in range(nsteps):
            self.full = self._step_jit(self.full, self._thr,
                                       self._thr_ghost,
                                       jnp.uint32(self.step))
            self.step += 1

    def block(self):
        jax.block_until_ready(self.full)

    def run(self, log=print):
        """The reference-style measurement loop (schedules, early exit,
        ramp, flips/ns report) over SW updates — the CLI's --algo sw
        entry. Step counts mean SW updates, not Metropolis sweeps."""
        from .driver import run_loop
        return run_loop(self, log=log)

    def _corr_path(self):
        return (f"corr_{self.cfg.nrows}x{self.cfg.ncols}"
                f"_T_{self.temp:f}_{self.cfg.seed}")

    def _append_corr(self, it: int):
        from . import observables
        c = observables.correlation(*self.bits())
        with open(self._corr_path(), "a") as f:
            f.write(f"{it:10d}")
            for val in c:
                f.write(f" {val:< 12G}")
            f.write("\n")

    def dump(self, name: str):
        from . import io as lio
        lio.dump_lattice(name, *self.bits(), fmt="hex")

    def _dump(self, it: int):
        self.dump(f"lattice_{self.cfg.nrows}x{self.cfg.ncols}"
                  f"_T_{self.temp:f}_IT_{it:08d}.txt")

    def bits(self):
        """Compact (black, white) planes of the current state — the same
        storage Simulation(state=...) accepts, for hybrid protocols."""
        return full_to_compact(self.full)

    def replica_magnetizations(self):
        """|m| per sub-lattice replica (flattened) — the measurement
        the tc_sweep/Binder workloads feed to analysis.py. Requires
        replica mode (cfg.xsl/ysl)."""
        if self.cfg.xsl is None:
            raise ValueError("replica_magnetizations needs replica mode "
                             "(cfg.xsl/ysl)")
        from . import observables
        return observables.replica_magnetizations(
            *self.bits(), xsl=self.cfg.xsl, ysl=self.cfg.ysl)

    def fourier_partials(self):
        """Exact (per-row, per-column) up counts, int64 numpy — the same
        surface as Simulation.fourier_partials (analysis.kmin_mag2 /
        correlation_length finish xi host-side). With SW's O(1)
        decorrelation at Tc this is the fast path to xi_L/L crossings."""
        from . import observables
        b, w = self.bits()
        rows = observables.row_up_counts(b, w)
        cols = observables.col_up_counts(b, w)
        r, c = jax.device_get((rows, cols))
        return np.asarray(r, np.int64), np.asarray(c, np.int64)

    def measure(self):
        from . import observables
        n_up, n_dn = observables.count_spins(*self.bits())
        out = {"step": self.step, "magnetization":
               abs(n_up - n_dn) / (n_up + n_dn), "up": n_up, "down": n_dn}
        if self.cfg.field:
            out["m_signed"] = (n_up - n_dn) / (n_up + n_dn)
        return out

    def energy(self) -> float:
        from . import observables
        b, w = self.bits()
        e = observables.energy_per_spin(b, w)
        h = self.cfg.field
        if h:
            n_up, n_dn = observables.count_spins(b, w)
            e -= h * (n_up - n_dn) / self.cfg.nspins
        return e
