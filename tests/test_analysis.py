"""Replica observables and Binder-cumulant analysis."""

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig
from ising_tpu.analysis import MomentAccumulator, binder_crossing
from ising_tpu.driver import Simulation
from ising_tpu.observables import (packed_row_up_counts,
                                   replica_magnetizations, row_up_counts)


def test_packed_popcount_matches_dense_counts():
    from ising_tpu.ops.pallas_packed import pack_bits
    rs = np.random.RandomState(0)
    b = jnp.asarray(rs.randint(0, 2, (8, 32)).astype(np.uint8))
    w = jnp.asarray(rs.randint(0, 2, (8, 32)).astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(row_up_counts(b, w)),
        np.asarray(packed_row_up_counts(pack_bits(b), pack_bits(w))))


def test_replica_magnetizations_known():
    # 2x2 grid of 4x4 replicas: set one replica all-up, rest alternating.
    Y = X = 8
    full = np.indices((Y, X)).sum(axis=0) % 2  # checkerboard: m = 0
    full[:4, :4] = 1                            # one replica all up: m = 1
    from ising_tpu.lattice import full_to_compact
    b, w = full_to_compact(jnp.asarray(full.astype(np.uint8)))
    ms = replica_magnetizations(b, w, xsl=4, ysl=4)
    assert sorted(ms) == [0.0, 0.0, 0.0, 1.0]


def test_moment_accumulator():
    acc = MomentAccumulator()
    acc.add(np.array([1.0, 1.0]))
    # all mass at |m| = 1: U4 = 1 - 1/3 = 2/3
    assert acc.binder_cumulant() == pytest.approx(2.0 / 3.0)
    assert acc.mean == 1.0
    acc2 = MomentAccumulator()
    # Gaussian m (disordered phase): U4 -> 0 for <m^4> = 3 <m^2>^2
    rs = np.random.RandomState(0)
    acc2.add(np.abs(rs.normal(size=200000)))
    assert abs(acc2.binder_cumulant()) < 0.01


def test_binder_crossing_synthetic():
    temps = np.array([2.0, 2.2, 2.4, 2.6])
    u4 = {16: np.array([0.6, 0.5, 0.3, 0.1]),
          32: np.array([0.64, 0.52, 0.2, 0.02])}
    tc = binder_crossing(temps, u4)
    assert 2.2 < tc < 2.4


def test_binder_physics_tiny():
    """Ordered phase: U4 near 2/3 for small replicas at low T."""
    cfg = SimConfig(nrows=32, ncols=32, temp=1.2, seed=9, xsl=8, ysl=8,
                    niters=1)
    sim = Simulation(cfg)
    sim.advance(150)
    acc = MomentAccumulator()
    for _ in range(10):
        sim.advance(5)
        acc.add(replica_magnetizations(*sim.bits(), xsl=8, ysl=8))
    assert acc.binder_cumulant() > 0.55
    assert acc.mean > 0.85
