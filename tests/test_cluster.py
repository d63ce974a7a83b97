"""Swendsen-Wang cluster updates: labeling vs an independent union-find,
flip coherence, determinism, and equilibrium physics (Onsager energy —
the SAME fixed point the Metropolis tiers are validated against, reached
by a completely different dynamics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, analysis
from ising_tpu.cluster import (SwendsenWang, bond_threshold, label_clusters,
                               label_clusters_tiled, open_bonds, sw_step)
from ising_tpu.models import ising


def uf_labels(open_r, open_d):
    """Union-find ground truth: min site id per component, periodic."""
    Y, X = open_r.shape
    parent = list(range(Y * X))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for y in range(Y):
        for x in range(X):
            if open_r[y, x]:
                union(y * X + x, y * X + (x + 1) % X)
            if open_d[y, x]:
                union(y * X + x, ((y + 1) % Y) * X + x)
    return np.array([find(i) for i in range(Y * X)],
                    np.int32).reshape(Y, X)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("p", [0.2, 0.5, 0.8])
def test_label_clusters_match_union_find(seed, p):
    rs = np.random.RandomState(seed)
    Y, X = 12, 16
    open_r = rs.rand(Y, X) < p
    open_d = rs.rand(Y, X) < p
    want = uf_labels(open_r, open_d)
    # every contraction composition must reach the same fixpoint
    for kw in (dict(), dict(scans=False, jumps=0), dict(scans=False),
               dict(scans=True, jumps=0), dict(jumps=2)):
        got = np.asarray(label_clusters(jnp.asarray(open_r),
                                        jnp.asarray(open_d), **kw))
        np.testing.assert_array_equal(got, want, err_msg=str(kw))


@pytest.mark.parametrize("shape", [(128, 128), (64, 256), (256, 512),
                                   (40, 160)])
@pytest.mark.parametrize("p", [0.0, 0.585, 1.0])
def test_label_clusters_tiled_matches(shape, p):
    """The Pallas VMEM labeler (sw_step's TPU branch; Pallas interpret
    mode here) reaches the identical min-label fixpoint as the
    union-find-verified label_clusters — incl. multi-tile grids
    (512x512), non-square tiles, and a shape with no legal tile
    (40x160 exercises the stencil fallback)."""
    rs = np.random.RandomState(17)
    Y, X = shape
    open_r = jnp.asarray(rs.rand(Y, X) < p)
    open_d = jnp.asarray(rs.rand(Y, X) < p)
    want = np.asarray(label_clusters(open_r, open_d))
    got = np.asarray(label_clusters_tiled(open_r, open_d))
    np.testing.assert_array_equal(got, want)


def test_label_clusters_wraparound_single_cluster():
    # All bonds open: one cluster, label 0 everywhere (periodic wrap).
    o = jnp.ones((8, 8), bool)
    np.testing.assert_array_equal(np.asarray(label_clusters(o, o)), 0)
    # No bonds open: every site is its own cluster.
    z = jnp.zeros((8, 8), bool)
    np.testing.assert_array_equal(
        np.asarray(label_clusters(z, z)),
        np.arange(64, dtype=np.int32).reshape(8, 8))


def test_sw_step_flips_whole_clusters():
    """Every site of a bond-connected cluster must flip identically."""
    from ising_tpu.rng import TAG_CLUSTER, color_draws
    cfg = SimConfig(nrows=16, ncols=16, temp=2.27, seed=7, backend="xla")
    sw = SwendsenWang(cfg)
    pre = np.asarray(sw.full)
    thr = bond_threshold(cfg.temperature)
    dr = color_draws(cfg.seed, 16, 16, step=jnp.uint32(0),
                     tag=TAG_CLUSTER | 0, row_stride=16)
    dd = color_draws(cfg.seed, 16, 16, step=jnp.uint32(0),
                     tag=TAG_CLUSTER | 1, row_stride=16)
    o_r, o_d = open_bonds(jnp.asarray(pre), dr, dd, thr)
    labels = np.asarray(label_clusters(o_r, o_d))
    sw.advance(1)
    flip = pre ^ np.asarray(sw.full)
    for lab in np.unique(labels):
        vals = np.unique(flip[labels == lab])
        assert vals.size == 1, f"cluster {lab} flipped incoherently"
    # and the aligned-bond invariant: open bonds never join anti-aligned
    assert not np.any(np.asarray(o_r) & (pre != np.roll(pre, -1, axis=1)))


def test_sw_deterministic_and_jit_stable():
    cfg = SimConfig(nrows=12, ncols=16, temp=2.0, seed=99, backend="xla")
    a, b = SwendsenWang(cfg), SwendsenWang(cfg)
    a.advance(5), b.advance(5)
    np.testing.assert_array_equal(np.asarray(a.full), np.asarray(b.full))
    # eager step == jitted step
    c = SwendsenWang(cfg)
    full = c.full
    for s in range(5):
        full = sw_step(full, c._thr, cfg.seed, jnp.uint32(s))
    np.testing.assert_array_equal(np.asarray(a.full), np.asarray(full))


def test_bond_threshold_limits():
    assert bond_threshold(0.0) == 0xFFFFFFFF
    assert bond_threshold(-1.0) == 0xFFFFFFFF
    p = 1.0 - np.exp(-2.0 / 2.5)
    assert bond_threshold(2.5) == int(np.rint(p * 4294967295.0))


def test_config_fencing():
    with pytest.raises(ValueError, match="ferromagnetic"):
        SwendsenWang(SimConfig(nrows=8, ncols=16, temp=2.0, backend="xla",
                               j_prob=0.3))
    with pytest.raises(ValueError, match="single-device"):
        SwendsenWang(SimConfig(nrows=64, ncols=64, temp=2.0, backend="xla",
                               xsl=8, ysl=8, ndev=8))
    with pytest.raises(ValueError, match="decoded"):
        SwendsenWang(SimConfig(nrows=8, ncols=64, temp=2.0,
                               backend="bit1"))


def test_sw_equilibrium_energy_matches_onsager():
    """SW must converge to the same thermal state as Metropolis: E/N vs
    the exact Onsager energy, both phases."""
    for T, tol in ((3.5, 0.03), (1.5, 0.02)):
        sw = SwendsenWang(SimConfig(nrows=64, ncols=64, temp=T, seed=5,
                                    backend="xla"))
        sw.advance(30)
        es = []
        for _ in range(40):
            sw.advance(2)
            es.append(sw.energy())
        got = float(np.mean(es))
        want = ising.onsager_energy(T)
        assert abs(got - want) < tol, (T, got, want)


def test_ghost_clusters_never_flip():
    """Ghost-bonded clusters must keep their orientation exactly."""
    from ising_tpu.cluster import ghost_bonded_clusters
    from ising_tpu.rng import TAG_CLUSTER, color_draws
    cfg = SimConfig(nrows=16, ncols=16, temp=2.5, seed=77, backend="xla",
                    field=0.8)
    sw = SwendsenWang(cfg)
    pre = np.asarray(sw.full)
    # reconstruct the step's internals for step 0
    dr = color_draws(cfg.seed, 16, 16, step=jnp.uint32(0),
                     tag=TAG_CLUSTER | 0, row_stride=16)
    dd = color_draws(cfg.seed, 16, 16, step=jnp.uint32(0),
                     tag=TAG_CLUSTER | 1, row_stride=16)
    dg = color_draws(cfg.seed, 16, 16, step=jnp.uint32(0),
                     tag=TAG_CLUSTER | 3, row_stride=16)
    o_r, o_d = open_bonds(jnp.asarray(pre), dr, dd,
                          bond_threshold(cfg.temperature))
    labels = label_clusters(o_r, o_d)
    ghost = (jnp.asarray(pre) == 1) & (
        dg <= jnp.uint32(bond_threshold(cfg.temperature, 0.8)))
    frozen = np.asarray(ghost_bonded_clusters(labels, ghost)).astype(bool)
    assert frozen.any()  # the construction must actually engage
    sw.advance(1)
    flip = pre ^ np.asarray(sw.full)
    assert not np.any(flip[frozen])
    # and whole-cluster coherence still holds for the free clusters
    lab_np = np.asarray(labels)
    for lab in np.unique(lab_np):
        assert np.unique(flip[lab_np == lab]).size == 1


def test_sw_field_reversal_trajectory_symmetry():
    """Complement the start state and negate h: bonds, labels and coins
    are all invariant, so the trajectory complements bit for bit."""
    from ising_tpu.lattice import init_bits
    base = dict(nrows=12, ncols=16, temp=2.3, seed=9, backend="xla")
    b0, w0 = init_bits(9, 12, 16)
    sp = SwendsenWang(SimConfig(field=0.9, **base), state=(b0, w0))
    sn = SwendsenWang(SimConfig(field=-0.9, **base),
                      state=(b0 ^ jnp.uint8(1), w0 ^ jnp.uint8(1)))
    sp.advance(4), sn.advance(4)
    np.testing.assert_array_equal(np.asarray(sp.full) ^ 1,
                                  np.asarray(sn.full))


def test_sw_field_equilibrium_matches_metropolis():
    """Two unrelated dynamics, one ensemble: SW-with-ghost and
    field-Metropolis must agree on m(T, h)."""
    from ising_tpu.driver import Simulation
    cfg = SimConfig(nrows=32, ncols=32, temp=3.0, seed=21, backend="xla",
                    field=0.5)
    sw = SwendsenWang(cfg)
    sw.advance(30)
    met = Simulation(cfg)
    met.advance(150)
    ms_sw, ms_met = [], []
    for _ in range(60):
        sw.advance(2)
        ms_sw.append(sw.measure()["m_signed"])
        met.advance(5)
        ms_met.append(met.measure()["m_signed"])
    assert abs(np.mean(ms_sw) - np.mean(ms_met)) < 0.03, \
        (np.mean(ms_sw), np.mean(ms_met))
    # field-aware energies agree between the drivers too
    assert abs(sw.energy() - met.energy()) < 0.2


def test_sw_set_field_scan_no_sign_change():
    sw = SwendsenWang(SimConfig(nrows=16, ncols=16, temp=2.5, seed=4,
                                backend="xla", field=0.2))
    sw.advance(2)
    sw.set_field(0.8)  # same sign: no rebuild, just a new ghost threshold
    sw.advance(2)
    assert sw.measure()["m_signed"] is not None


def test_sw_sharded_matches_single():
    """8-device row-sharded SW trajectory bit-identical to 1 device
    (rolls/scans/gather are GSPMD-transparent)."""
    base = dict(nrows=32, ncols=32, temp=2.269185, seed=7, backend="xla")
    s1 = SwendsenWang(SimConfig(ndev=1, **base))
    s8 = SwendsenWang(SimConfig(ndev=8, **base))
    s1.advance(4), s8.advance(4)
    np.testing.assert_array_equal(np.asarray(s1.full), np.asarray(s8.full))
    # with a field too (ghost scatter-max + gather under sharding)
    f1 = SwendsenWang(SimConfig(ndev=1, field=0.6, **base))
    f8 = SwendsenWang(SimConfig(ndev=8, field=0.6, **base))
    f1.advance(3), f8.advance(3)
    np.testing.assert_array_equal(np.asarray(f1.full), np.asarray(f8.full))


def test_tiled_labeler_sharded_matches_single():
    """The Pallas labeler under an 8-device shard_map (sw_step's
    multi-device TPU path; interpret mode here) produces labels and
    trajectories identical to the single-device run — tiles align with
    the shard boundary, the global stencil carries cross-shard bonds."""
    from ising_tpu.cluster import label_clusters_tiled
    from ising_tpu.parallel.mesh import ROW_AXIS, make_mesh
    from jax.sharding import NamedSharding, PartitionSpec
    import jax

    rs = np.random.RandomState(5)
    Y, X = 128, 128
    o_r = jnp.asarray(rs.rand(Y, X) < 0.585)
    o_d = jnp.asarray(rs.rand(Y, X) < 0.585)
    want = np.asarray(label_clusters(o_r, o_d))
    mesh = make_mesh(8)
    sh = NamedSharding(mesh, PartitionSpec(ROW_AXIS, None))
    got = np.asarray(label_clusters_tiled(
        jax.device_put(o_r, sh), jax.device_put(o_d, sh), mesh=mesh))
    np.testing.assert_array_equal(got, want)

    # full sw_step through the mesh path, forced tiled, vs 1-device
    full = jnp.asarray(rs.randint(0, 2, (Y, X)), jnp.uint8)
    thr = jnp.uint32(bond_threshold(2.269185))
    ref = np.asarray(sw_step(full, thr, 9, jnp.uint32(0)))
    got = np.asarray(sw_step(jax.device_put(full, sh), thr, 9,
                             jnp.uint32(0), tiled=True, mesh=mesh))
    np.testing.assert_array_equal(got, ref)


def test_sw_replica_independence_and_graph():
    """Replica-mode SW: (a) replicas are dynamically independent —
    changing replica (0,0)'s initial content leaves every other
    replica's trajectory bit-unchanged under the same streams; (b) each
    replica's bond graph is the standard periodic (ysl, xsl) graph (its
    open-bond tiles labeled per replica match union-find)."""
    from ising_tpu.cluster import sw_step_replica
    Y, X, ysl, xsl = 32, 48, 16, 16
    rs = np.random.RandomState(3)
    full = jnp.asarray(rs.randint(0, 2, (Y, X)), jnp.uint8)
    thr = jnp.uint32(bond_threshold(2.269185))
    a = full
    for s in range(3):
        a = sw_step_replica(a, thr, 11, jnp.uint32(s), xsl=xsl, ysl=ysl)
    # perturb ONLY replica (0,0)
    full2 = full.at[:ysl, :xsl].set(1 - full[:ysl, :xsl])
    b = full2
    for s in range(3):
        b = sw_step_replica(b, thr, 11, jnp.uint32(s), xsl=xsl, ysl=ysl)
    a, b = np.asarray(a), np.asarray(b)
    outside = np.ones((Y, X), bool)
    outside[:ysl, :xsl] = False
    np.testing.assert_array_equal(a[outside], b[outside])
    assert (a[:ysl, :xsl] != b[:ysl, :xsl]).any()

    # (b) bond topology end-to-end: independently rebuild the
    # within-tile periodic FK bonds (scalar, naive_color_sweep's tile
    # neighbor convention), union-find each replica, and assert one
    # sw_step_replica flips every cluster as a unit.
    from ising_tpu.cluster import color_draws, TAG_CLUSTER
    dr = np.asarray(color_draws(11, Y, X, step=jnp.uint32(0),
                                tag=TAG_CLUSTER | 0, row_stride=X))
    dd = np.asarray(color_draws(11, Y, X, step=jnp.uint32(0),
                                tag=TAG_CLUSTER | 1, row_stride=X))
    fr = np.asarray(full)
    t = int(thr)
    flip = fr ^ np.asarray(sw_step_replica(full, thr, 11, jnp.uint32(0),
                                           xsl=xsl, ysl=ysl))
    for ry in range(0, Y, ysl):
        for rx in range(0, X, xsl):
            o_r = np.zeros((ysl, xsl), bool)
            o_d = np.zeros((ysl, xsl), bool)
            for y in range(ysl):
                for x in range(xsl):
                    gy, gx = ry + y, rx + x
                    o_r[y, x] = (fr[gy, gx] == fr[gy, rx + (x + 1) % xsl]
                                 and dr[gy, gx] <= t)
                    o_d[y, x] = (fr[gy, gx] == fr[ry + (y + 1) % ysl, gx]
                                 and dd[gy, gx] <= t)
            labels = uf_labels(o_r, o_d)
            tile_flip = flip[ry:ry + ysl, rx:rx + xsl]
            for root in np.unique(labels):
                vals = np.unique(tile_flip[labels == root])
                assert len(vals) == 1, (ry, rx, root, vals)


def test_sw_replica_equilibrium_matches_onsager():
    """16 independent 32^2 replicas in one 128x128 plane: the pooled
    equilibrium energy at T=1.5 must hit the Onsager value — the same
    physics gate as the full-lattice SW test, through the replica path
    (within-tile wrap bonds, globalized coins)."""
    from ising_tpu.observables import energy_per_spin
    from ising_tpu.lattice import full_to_compact
    cfg = SimConfig(nrows=128, ncols=128, temp=1.5, seed=5,
                    backend="xla", xsl=32, ysl=32)
    sw = SwendsenWang(cfg)
    sw.advance(30)
    es = []
    for _ in range(12):
        sw.advance(2)
        # per-replica wrap energy: full-lattice energy_per_spin would
        # count the closed inter-replica bonds; slice one replica out
        f = np.asarray(sw.full)
        for ry in range(0, 128, 32):
            e = full_to_compact(jnp.asarray(f[ry:ry + 32, :32]))
            es.append(float(energy_per_spin(*e)))
    onsager = -1.9511  # exact E/N at T=1.5
    got = float(np.mean(es))
    assert abs(got - onsager) < 0.03, (got, onsager)
    # per-replica magnetization surface works
    ms = sw.replica_magnetizations()
    assert len(np.ravel(ms)) == 16
    assert 0.8 < float(np.mean(np.abs(ms))) <= 1.0  # ordered at T=1.5


def test_sw_decorrelates_fast_at_tc():
    """The point of the feature: tau_int(|m|) at Tc stays O(1) SW steps
    (Metropolis at the same size is an order of magnitude slower)."""
    from ising_tpu.constants import TCRIT
    sw = SwendsenWang(SimConfig(nrows=32, ncols=32, temp=TCRIT, seed=17,
                                backend="xla"))
    sw.advance(20)
    ms = []
    for _ in range(300):
        sw.advance(1)
        ms.append(sw.measure()["magnetization"])
    tau, _ = analysis.autocorrelation_time(ms)
    assert tau < 6.0, tau
