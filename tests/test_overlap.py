"""Edwards-Anderson replica overlap: exactness, backend parity, PT wiring.

q = (1/N) sum_i s^(1)_i s^(2)_i between two independent thermal replicas
of one disorder realization — THE spin-glass order parameter. The device
partial is an exact integer XOR count (word-domain on bit1/packed,
streamed decode elsewhere), so every test here can demand equality, not
tolerance.
"""

import numpy as np
import pytest

from ising_tpu import SimConfig
from ising_tpu.analysis import binder_g
from ising_tpu.driver import Simulation
from ising_tpu.tempering import ParallelTempering, replica_overlap

# Smallest comfortable geometry per backend (bit1 needs >= 128 columns,
# mxu 128-tiles).
SHAPES = {"xla": (16, 32), "dense": (16, 32), "packed": (16, 64),
          "bit1": (16, 128), "mxu": (128, 256)}


def _pair(backend, steps=4, seeds=(21, 22), **kw):
    Y, X = SHAPES[backend]
    sims = []
    for s in seeds:
        sim = Simulation(SimConfig(nrows=Y, ncols=X, temp=2.0, seed=s,
                                   backend=backend, niters=steps, **kw))
        if steps:
            sim.advance(steps)
        sims.append(sim)
    return sims


def _naive_q(sa, sb):
    """Overlap recomputed from fully decoded planes with plain numpy."""
    n = sa.cfg.nspins
    neq = 0
    for pa, pb in zip(sa.bits(), sb.bits()):
        neq += int(np.sum(np.asarray(pa, np.int64)
                          ^ np.asarray(pb, np.int64)))
    return 1.0 - 2.0 * neq / n


@pytest.mark.parametrize("backend", list(SHAPES))
def test_overlap_matches_naive(backend):
    a, b = _pair(backend)
    q = a.overlap_with(b)
    assert q == _naive_q(a, b)          # exact: both are int ratios
    assert b.overlap_with(a) == q       # symmetric
    assert a.overlap_with(a) == 1.0     # self-overlap


def test_overlap_cross_backend_trajectory_parity():
    """Same seeds + same rng mode -> bit-identical trajectories across
    backends, so q must match EXACTLY backend to backend; and a
    mixed-backend pair at the same seed is the same state (q = 1)."""
    Y, X = SHAPES["bit1"]
    qs = {}
    for backend in ("xla", "packed", "bit1"):
        a, b = [Simulation(SimConfig(nrows=Y, ncols=X, temp=2.0, seed=s,
                                     backend=backend, niters=6))
                for s in (5, 6)]
        a.advance(6), b.advance(6)
        qs[backend] = a.overlap_with(b)
        if backend != "xla":
            # decode path bridges storage domains: xla state vs this
            # backend's state after identical trajectories
            twin = Simulation(SimConfig(nrows=Y, ncols=X, temp=2.0,
                                        seed=5, backend="xla", niters=6))
            twin.advance(6)
            assert a.overlap_with(twin) == 1.0
    assert qs["xla"] == qs["packed"] == qs["bit1"]


def test_overlap_disordered():
    a, b = _pair("packed", steps=4, j_prob=0.4, j_seed=77)
    q = a.overlap_with(b)
    assert q == _naive_q(a, b)
    assert -1.0 <= q <= 1.0


def test_overlap_geometry_mismatch_raises():
    a = Simulation(SimConfig(nrows=16, ncols=32, temp=2.0, niters=1))
    b = Simulation(SimConfig(nrows=16, ncols=64, temp=2.0, niters=1))
    with pytest.raises(ValueError, match="geometry"):
        a.overlap_with(b)


def _ladder(seed, j_seed=31, **kw):
    cfg = SimConfig(nrows=16, ncols=64, temp=1.0, seed=seed,
                    backend="packed", j_prob=0.5, j_seed=j_seed, **kw)
    return ParallelTempering(cfg, [0.8, 1.2, 1.8], sweeps_per_swap=1)


def test_replica_overlap_per_rung():
    pa, pb = _ladder(100), _ladder(200)
    for _ in range(3):
        pa.advance_round(), pb.advance_round()
    qs = replica_overlap(pa, pb)
    assert len(qs) == 3
    assert all(-1.0 <= q <= 1.0 for q in qs)
    # exact per-rung agreement with the Simulation-level observable
    for k in range(3):
        assert qs[k] == pa.sims[k].overlap_with(pb.sims[k])
    # deterministic: same ladders rebuilt from scratch reproduce q
    pa2, pb2 = _ladder(100), _ladder(200)
    for _ in range(3):
        pa2.advance_round(), pb2.advance_round()
    assert replica_overlap(pa2, pb2) == qs


def test_replica_overlap_validation():
    pa, pb = _ladder(100), _ladder(200)
    bad = ParallelTempering(
        SimConfig(nrows=16, ncols=64, temp=1.0, seed=300, backend="packed",
                  j_prob=0.5, j_seed=99), [0.8, 1.2, 1.8],
        sweeps_per_swap=1)
    with pytest.raises(ValueError, match="SAME disorder"):
        replica_overlap(pa, bad)
    with pytest.raises(ValueError, match="distinct seeds"):
        replica_overlap(pa, _ladder(100))
    other_grid = ParallelTempering(
        SimConfig(nrows=16, ncols=64, temp=1.0, seed=400, backend="packed",
                  j_prob=0.5, j_seed=31), [0.8, 1.3, 1.8],
        sweeps_per_swap=1)
    with pytest.raises(ValueError, match="temperature grid"):
        replica_overlap(pa, other_grid)
    # same j_seed but different j_prob = a different Hamiltonian
    other_p = ParallelTempering(
        SimConfig(nrows=16, ncols=64, temp=1.0, seed=500, backend="packed",
                  j_prob=0.3, j_seed=31), [0.8, 1.2, 1.8],
        sweeps_per_swap=1)
    with pytest.raises(ValueError, match="SAME disorder"):
        replica_overlap(pa, other_p)
    # cross-rung stream collision: ladder B's rung-0 seed equals A's
    # rung-1 seed (default spacing is 1000003); swaps migrate
    # configurations, so rung-wise checks would miss this
    with pytest.raises(ValueError, match="share thermal seed"):
        replica_overlap(pa, _ladder(100 + 1000003))


def test_binder_g_limits():
    assert binder_g(np.ones(100)) == 1.0                 # frozen: q = 1
    q = np.random.default_rng(3).normal(size=200_000)
    assert abs(binder_g(q)) < 0.02                       # Gaussian: g -> 0
    assert np.isnan(binder_g([]))


def test_overlap_multidevice_matches_single():
    """q is device-count independent like every other observable (the
    XOR partials ride the same sharded planes)."""
    kw = dict(nrows=32, ncols=64, temp=2.0, backend="xla", niters=4)
    qs = []
    for ndev in (1, 8):
        a = Simulation(SimConfig(seed=3, ndev=ndev, **kw))
        b = Simulation(SimConfig(seed=4, ndev=ndev, **kw))
        a.advance(4), b.advance(4)
        qs.append(a.overlap_with(b))
    assert qs[0] == qs[1]


def test_binder_g_disorder():
    from ising_tpu.analysis import binder_g_disorder
    # frozen phase: every realization has <q^2> = <q^4> = 1 -> g = 1, err 0
    g, err = binder_g_disorder(np.ones(20), np.ones(20))
    assert g == pytest.approx(1.0) and err == pytest.approx(0.0, abs=1e-12)
    # Gaussian P(q) per realization (paramagnet): <q^4> = 3 <q^2>^2 -> g = 0
    rng = np.random.default_rng(8)
    s2 = rng.uniform(0.5, 1.5, 400)      # realization-dependent width
    g, err = binder_g_disorder(s2, 3.0 * s2 ** 2)
    # [<q^4>] = 3 [<q^2>^2] != 3 [<q^2>]^2: disorder scatter shifts g
    # below 0 — exactly the bias the disorder-averaged form captures.
    expect = 0.5 * (3.0 - 3.0 * np.mean(s2 ** 2) / np.mean(s2) ** 2)
    assert g == pytest.approx(expect, abs=4 * err + 1e-3)
    with pytest.raises(ValueError, match="paired"):
        binder_g_disorder(np.ones(3), np.ones(4))
