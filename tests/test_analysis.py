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


def test_autocorrelation_time_ar1():
    # AR(1): rho(t) = phi^t exactly, tau_int = (1 + phi) / (2 (1 - phi)).
    from ising_tpu.analysis import autocorrelation_time
    rs = np.random.RandomState(7)
    phi = 0.8
    n = 200_000
    eps = rs.randn(n)
    x = np.empty(n)
    x[0] = eps[0]
    for t in range(1, n):
        x[t] = phi * x[t - 1] + eps[t]
    tau, W = autocorrelation_time(x)
    exact = (1 + phi) / (2 * (1 - phi))  # 4.5
    assert tau == pytest.approx(exact, rel=0.10)
    assert W >= 5  # window saw the correlated tail


def test_autocorrelation_time_iid():
    from ising_tpu.analysis import autocorrelation_time
    rs = np.random.RandomState(3)
    tau, W = autocorrelation_time(rs.randn(50_000))
    assert tau == pytest.approx(0.5, abs=0.05)
    assert W <= 10


def test_binned_error_matches_naive_iid_and_inflates_ar1():
    from ising_tpu.analysis import binned_error
    rs = np.random.RandomState(11)
    x = rs.randn(64_000)
    naive = x.std(ddof=1) / np.sqrt(x.size)
    assert binned_error(x, nbins=64) == pytest.approx(naive, rel=0.35)
    # AR(1) with phi = 0.8: true SEM is sqrt(2 tau) = 3x the naive one.
    phi = 0.8
    y = np.empty(64_000)
    y[0] = rs.randn()
    for t in range(1, y.size):
        y[t] = phi * y[t - 1] + rs.randn()
    ratio = binned_error(y, nbins=64) / (y.std(ddof=1) / np.sqrt(y.size))
    assert 2.0 < ratio < 4.5


def test_jackknife_mean_matches_classic_sem():
    from ising_tpu.analysis import jackknife
    rs = np.random.RandomState(5)
    s = rs.randn(200)
    est, err = jackknife(s, lambda a: float(np.mean(a)))
    assert est == pytest.approx(float(s.mean()), abs=1e-12)
    assert err == pytest.approx(s.std(ddof=1) / np.sqrt(s.size), rel=1e-6)


def test_jackknife_binder_error_shrinks_with_samples():
    from ising_tpu.analysis import binder_u4, jackknife

    rs = np.random.RandomState(9)
    _, err_small = jackknife(rs.randn(64), binder_u4)
    _, err_big = jackknife(rs.randn(1024), binder_u4)
    assert err_big < err_small
    # gaussian m: <m^4> = 3 <m^2>^2, so U4 -> 0
    est, _ = jackknife(rs.randn(4096), binder_u4)
    assert abs(est) < 0.05


def test_binned_error_rejects_one_sample_bins():
    from ising_tpu.analysis import binned_error
    with pytest.raises(ValueError, match="at least 4 samples"):
        binned_error(np.arange(3.0))
    # 20 samples: bins capped at 10 of 2, never 1-sample bins
    assert binned_error(np.arange(20.0), nbins=32) > 0


def test_specific_heat_identity():
    acc = MomentAccumulator()
    e = np.array([-1.9, -1.8, -2.0, -1.85])
    acc.add(e)
    want = 100 * (np.mean(e ** 2) - np.mean(e) ** 2) / 1.5 ** 2
    assert acc.specific_heat(100, 1.5) == pytest.approx(want)


# ---- finite-size scaling collapse (Houdayer-Hartmann) ----------------------

def _synthetic_collapse(tc=2.269, nu=1.0, zeta=0.0, noise=0.01, seed=0):
    """Curves generated FROM a known scaling function F(x) = .6 - .4 tanh x
    with iid Gaussian noise of known size — quality ~ 1 at the truth."""
    rng = np.random.default_rng(seed)
    data = {}
    for L in (8, 16, 32, 64):
        temps = np.linspace(tc - 0.25, tc + 0.25, 31)
        x = (temps - tc) * L ** (1.0 / nu)
        y = L ** zeta * (0.6 - 0.4 * np.tanh(x))
        dy = np.full_like(y, noise * max(1.0, L ** zeta))
        data[L] = (temps, y + rng.normal(0.0, dy), dy)
    return data


def test_collapse_quality_at_truth_is_order_one():
    from ising_tpu.analysis import collapse_quality
    data = _synthetic_collapse()
    s_true = collapse_quality(data, 2.269, 1.0)
    assert 0.4 < s_true < 2.5
    # degrading either parameter must blow S up
    assert collapse_quality(data, 2.32, 1.0) > 5.0 * s_true
    assert collapse_quality(data, 2.269, 1.6) > 5.0 * s_true


def test_fit_collapse_recovers_parameters():
    from ising_tpu.analysis import fit_collapse
    data = _synthetic_collapse(seed=3)
    out = fit_collapse(data, tc0=2.24, nu0=1.2, errors=True)
    assert abs(out["tc"] - 2.269) < 3.0 * out["tc_err"] + 1e-3
    assert abs(out["nu"] - 1.0) < 3.0 * out["nu_err"] + 0.01
    assert out["quality"] < 2.5
    assert 0 < out["tc_err"] < 0.02 and 0 < out["nu_err"] < 0.2


def test_fit_collapse_with_scaling_dimension():
    from ising_tpu.analysis import fit_collapse
    # chi-type observable: y = L^zeta F(x), zeta = 1.75 (2D Ising gamma/nu)
    data = _synthetic_collapse(zeta=1.75, noise=0.005, seed=5)
    out = fit_collapse(data, tc0=2.25, nu0=1.1, zeta0=1.6)
    assert abs(out["tc"] - 2.269) < 0.01
    assert abs(out["nu"] - 1.0) < 0.1
    assert abs(out["zeta"] - 1.75) < 0.05


def test_collapse_quality_validation():
    from ising_tpu.analysis import collapse_quality
    t = np.linspace(2.0, 2.5, 10)
    y = np.ones(10)
    e = np.full(10, 0.01)
    with pytest.raises(ValueError, match="two lattice sizes"):
        collapse_quality({8: (t, y, e)}, 2.269, 1.0)
    with pytest.raises(ValueError, match="align"):
        collapse_quality({8: (t, y, e), 16: (t, y[:5], e)}, 2.269, 1.0)
    with pytest.raises(ValueError, match="> 0"):
        collapse_quality({8: (t, y, e), 16: (t, y, 0 * e)}, 2.269, 1.0)
