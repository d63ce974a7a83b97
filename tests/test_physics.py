"""Acceptance tables and exact-solution validators."""

import math

import numpy as np
import pytest

from ising_tpu.constants import TCRIT
from ising_tpu.models import ising


def test_threshold_table_matches_exp():
    T = 1.5
    thr = ising.threshold_table(T)
    assert thr.shape == (10,)
    for b in range(2):
        for n in range(5):
            de = 2.0 * (2 * b - 1) * (2 * n - 4)
            p = min(1.0, math.exp(-de / T))
            expect = round(p * 4294967295.0)
            assert int(thr[b * 5 + n]) == expect


def test_threshold_full_accept_classes():
    thr = ising.threshold_table(1.5)
    # dE <= 0 classes accept always (exp >= 1): b=0 (spin -1) with n<=2,
    # b=1 (spin +1) with n>=2.
    for b in range(2):
        for n in range(5):
            de = 2.0 * (2 * b - 1) * (2 * n - 4)
            if de <= 0:
                assert int(thr[b * 5 + n]) == 0xFFFFFFFF


def test_zero_temperature_greedy():
    thr = ising.threshold_table(0.0)
    for b in range(2):
        for n in range(5):
            de = 2.0 * (2 * b - 1) * (2 * n - 4)
            if de < 0:
                assert int(thr[b * 5 + n]) == 0xFFFFFFFF
            elif de > 0:
                assert int(thr[b * 5 + n]) == 0
            else:
                assert int(thr[b * 5 + n]) == round(0.5 * 4294967295.0)


def test_bernoulli_kbit_thresholds():
    t4, t8 = ising.bernoulli_kbit_thresholds(1.5, 24)
    assert t4 == round(math.exp(-4.0 / 1.5) * 2 ** 24)
    assert t8 == round(math.exp(-8.0 / 1.5) * 2 ** 24)
    # quantization error bound 2^-(k+1)
    assert abs(t4 / 2 ** 24 - math.exp(-4.0 / 1.5)) <= 2 ** -25
    # T <= 0: both stochastic classes reject outright
    assert ising.bernoulli_kbit_thresholds(0.0, 24) == (0, 0)
    # huge T: clipped below always-accept (strict compare cannot express 1)
    t4h, _ = ising.bernoulli_kbit_thresholds(1e9, 24)
    assert t4h == 2 ** 24 - 1


def test_onsager_magnetization():
    assert ising.onsager_magnetization(TCRIT + 0.1) == 0.0
    assert ising.onsager_magnetization(3.0) == 0.0
    # Known value at T = 1.5: (1 - sinh(2/1.5)^-4)^(1/8)
    x = math.sinh(2.0 / 1.5)
    assert ising.onsager_magnetization(1.5) == pytest.approx(
        (1 - x ** -4) ** 0.125, rel=1e-12)
    # monotone decreasing towards Tc
    ms = [ising.onsager_magnetization(t) for t in np.linspace(0.5, 2.2, 20)]
    assert all(a >= b for a, b in zip(ms, ms[1:]))


def test_onsager_energy_limits():
    # T -> 0: fully ordered, E/N -> -2.
    assert ising.onsager_energy(0.05) == pytest.approx(-2.0, abs=1e-6)
    # Known exact value at Tc: -sqrt(2).
    assert ising.onsager_energy(TCRIT) == pytest.approx(-math.sqrt(2.0), abs=1e-6)
    # High T: E -> 0 like -2/T (leading order, within 20%).
    assert ising.onsager_energy(50.0) == pytest.approx(-2.0 / 50.0, rel=0.2)


def test_disorder_links_stats_and_determinism():
    v1, h1 = ising.generate_disorder_links(7, 64, 64, 0.25)
    v2, h2 = ising.generate_disorder_links(7, 64, 64, 0.25)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    frac = (np.asarray(v1).mean() + np.asarray(h1).mean()) / 2
    assert abs(frac - 0.25) < 0.02
    v3, _ = ising.generate_disorder_links(8, 64, 64, 0.25)
    assert not np.array_equal(np.asarray(v1), np.asarray(v3))
