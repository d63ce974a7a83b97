"""Histogram reweighting vs exact enumeration.

Same ground-truth engine as test_boltzmann.py: every one of the 2^16
states of a 2x8 lattice, so <E>(T), <M^2>(T), C(T) and even the free
energies are known EXACTLY at any temperature. Samples are drawn i.i.d.
from the exact Boltzmann distribution (independence makes the error bars
analytic), then single-histogram reweighting and WHAM must reproduce the
exact curves at temperatures that were never sampled.
"""

import math

import numpy as np
import pytest

from ising_tpu.reweight import (Wham, effective_sample_size, peak_location,
                                reweight, reweight_curve, wham,
                                wham_jackknife)

Y, X = 2, 8
N = Y * X


def _all_states():
    states = ((np.arange(1 << N)[:, None] >> np.arange(N)) & 1)
    s = (2.0 * states - 1.0).reshape(-1, Y, X)
    bonds = ((s * np.roll(s, -1, axis=2)).sum(axis=(1, 2))
             + (s * np.roll(s, -1, axis=1)).sum(axis=(1, 2)))
    M = s.sum(axis=(1, 2))
    return -bonds, M  # H (h=0), magnetization per state


H_ALL, M_ALL = _all_states()


def exact_probs(temp):
    w = np.exp(-(H_ALL - H_ALL.min()) / temp)
    return w / w.sum()


def exact_mean(temp, obs):
    return float(np.sum(exact_probs(temp) * obs))


def exact_log_z(temp):
    a = -H_ALL / temp
    amax = a.max()
    return float(amax + np.log(np.sum(np.exp(a - amax))))


def draw(temp, n, seed):
    rng = np.random.default_rng(seed)
    idx = rng.choice(H_ALL.size, size=n, p=exact_probs(temp))
    return H_ALL[idx], M_ALL[idx]


def test_reweight_identity():
    E, _ = draw(2.5, 4000, seed=1)
    est, ess = reweight(E, 2.5, 2.5)
    assert est == pytest.approx(float(E.mean()), rel=1e-12)
    assert ess == pytest.approx(E.size, rel=1e-9)


@pytest.mark.parametrize("t_to", [2.2, 2.8])
def test_single_histogram_matches_exact(t_to):
    E, M = draw(2.5, 40_000, seed=7)
    est, ess = reweight(E, 2.5, t_to)
    var = exact_mean(t_to, H_ALL ** 2) - exact_mean(t_to, H_ALL) ** 2
    tol = 6.0 * math.sqrt(var / ess)
    assert abs(est - exact_mean(t_to, H_ALL)) < tol
    # an aligned observable: <M^2>(t_to)
    est2, _ = reweight(E, 2.5, t_to, observable=M.astype(float) ** 2)
    var2 = exact_mean(t_to, M_ALL ** 4.0) - exact_mean(t_to, M_ALL ** 2.0) ** 2
    assert abs(est2 - exact_mean(t_to, M_ALL ** 2.0)) < 6.0 * math.sqrt(
        var2 / ess)


def test_offset_invariance():
    # Shifting every energy by a giant constant (different lattice-size
    # zero points) must not change any reweighted estimate: the log-space
    # path has to absorb |E| ~ 1e10 without overflow.
    E, _ = draw(2.5, 5000, seed=3)
    a, _ = reweight(E, 2.5, 2.3)
    b, _ = reweight(E + 1e10, 2.5, 2.3)
    # float64 resolution at 1e10 is ~2e-6 per sample; the weighted sum
    # keeps the shift-invariant part to ~1e-3 absolute.
    assert b - 1e10 == pytest.approx(a, abs=1e-2)


# The ESS-collapse tests need a CONTINUOUS energy spectrum: on the tiny
# enumerable lattice hundreds of samples sit exactly at the ground-state
# energy, so even T -> 0 reweighting legitimately keeps ESS large (the
# guard is correct to let it through). Wide Gaussian energies make the
# single-dominant-sample regime reachable.
def _gaussian_energies(n=2000, mean=0.0, sigma=8.0, seed=5):
    return np.random.default_rng(seed).normal(mean, sigma, n)


def test_ess_guard_raises_far_from_window():
    E = _gaussian_energies()
    # delta-beta = 1 over sigma = 5 --> ESS ~ n * exp(-sigma^2) << 10
    with pytest.raises(ValueError, match="effective sample size"):
        reweight(E, 1.0, 0.5)


def test_reweight_curve_nans_outside_window():
    E = _gaussian_energies()
    temps = np.array([0.5, 0.99, 1.0, 1.01, 3.0])
    est, ess = reweight_curve(E, 1.0, temps)
    assert np.isnan(est[0]) and np.isnan(est[-1])
    assert np.all(np.isfinite(est[1:4]))
    assert ess[2] == pytest.approx(2000, rel=1e-9)
    # programming errors raise upfront instead of becoming all-nan curves
    with pytest.raises(ValueError, match="align"):
        reweight_curve(E, 1.0, temps, observable=E[:5])


TEMPS = (2.0, 2.5, 3.0)


def _ensemble(n=20_000, seed=11) -> tuple[Wham, np.ndarray]:
    runs, mags = [], []
    for i, t in enumerate(TEMPS):
        E, M = draw(t, n, seed=seed + i)
        runs.append(E)
        mags.append(M)
    return wham(runs, TEMPS), np.concatenate(mags)


def test_wham_free_energies_match_exact():
    ens, _ = _ensemble()
    assert ens.residual < 1e-12
    for k, t in enumerate(TEMPS):
        exact_f = -(exact_log_z(t) - exact_log_z(TEMPS[0]))
        # statistical error of log Z ratios at this n is ~1e-2
        assert ens.free_energies[k] == pytest.approx(exact_f, abs=0.05)


@pytest.mark.parametrize("t_to", [2.25, 2.75, 2.0, 3.0])
def test_wham_energy_matches_exact(t_to):
    ens, mags = _ensemble()
    est, ess = ens.expectation(t_to)
    var = exact_mean(t_to, H_ALL ** 2) - exact_mean(t_to, H_ALL) ** 2
    assert abs(est - exact_mean(t_to, H_ALL)) < 6.0 * math.sqrt(var / ess)
    est2, _ = ens.expectation(t_to, mags.astype(float) ** 2)
    var2 = exact_mean(t_to, M_ALL ** 4.0) - exact_mean(t_to, M_ALL ** 2.0) ** 2
    assert abs(est2 - exact_mean(t_to, M_ALL ** 2.0)) < 6.0 * math.sqrt(
        var2 / ess)


def test_wham_specific_heat_peak_matches_exact():
    ens, _ = _ensemble()
    # exact pseudo-critical point: argmax of C(T) by the same golden search
    def c_exact(t):
        return (exact_mean(t, H_ALL ** 2) - exact_mean(t, H_ALL) ** 2) \
            / (N * t * t)
    t_exact, _ = peak_location(c_exact, 2.0, 3.0, tol=1e-8)
    t_est, c_est = peak_location(
        lambda t: ens.specific_heat(t, N), 2.0, 3.0, tol=1e-8)
    assert t_est == pytest.approx(t_exact, abs=0.06)
    assert c_est == pytest.approx(c_exact(t_exact), rel=0.05)


def test_wham_expectation_outside_window_raises():
    # Continuous spectra again (see _gaussian_energies): two overlapping
    # Gaussian runs converge, but a query 19 delta-beta e-folds away is
    # carried by one sample and must be refused.
    rng = np.random.default_rng(17)
    runs = [rng.normal(-80.0, 10.0, 3000), rng.normal(-50.0, 10.0, 3000)]
    ens = wham(runs, [1.0, 2.0])
    with pytest.raises(ValueError, match="effective sample size"):
        ens.expectation(0.05)


def test_wham_input_validation():
    E, _ = draw(2.5, 100, seed=1)
    with pytest.raises(ValueError, match=">= 2 runs"):
        wham([E], [2.5])
    with pytest.raises(ValueError, match="one energy series"):
        wham([E, E], [2.5])
    with pytest.raises(ValueError, match="empty"):
        wham([E, np.array([])], [2.5, 2.6])


def test_effective_sample_size_limits():
    assert effective_sample_size(np.zeros(100)) == pytest.approx(100.0)
    lw = np.full(100, -700.0)
    lw[0] = 0.0  # one dominant weight
    assert effective_sample_size(lw) == pytest.approx(1.0)


def test_peak_location_quadratic():
    x, fx = peak_location(lambda t: -(t - 1.37) ** 2 + 4.0, 0.0, 3.0)
    assert x == pytest.approx(1.37, abs=1e-5)
    assert fx == pytest.approx(4.0, abs=1e-9)


def test_wham_jackknife_error_calibration():
    """Jackknife error bars must match the repeat-experiment scatter:
    16 independent datasets -> std of the estimates vs the mean reported
    error, within a generous band (iid draws, so no autocorrelation)."""
    t_query = 2.25
    ests, errs = [], []
    for rep in range(16):
        runs = [draw(t, 1500, seed=1000 + 31 * rep + i)[0]
                for i, t in enumerate(TEMPS)]
        est, err = wham_jackknife(
            runs, TEMPS, lambda ens: ens.expectation(t_query)[0],
            nblocks=8)
        ests.append(est)
        errs.append(err)
    scatter = np.std(ests, ddof=1)
    mean_err = float(np.mean(errs))
    assert 0.4 * scatter < mean_err < 2.5 * scatter
    # and the estimates actually surround the exact value
    assert abs(np.mean(ests) - exact_mean(t_query, H_ALL)) < \
        4.0 * scatter / math.sqrt(16)


def test_wham_jackknife_with_observables():
    runs, mags = [], []
    for i, t in enumerate(TEMPS):
        E, M = draw(t, 2000, seed=300 + i)
        runs.append(E)
        mags.append(M.astype(float) ** 2)
    est, err = wham_jackknife(
        runs, TEMPS,
        lambda ens, m2: ens.expectation(2.4, m2)[0],
        nblocks=8, observables_by_run=mags)
    assert err > 0
    exact = exact_mean(2.4, M_ALL ** 2.0)
    assert abs(est - exact) < 6.0 * err + 0.02 * exact


def test_wham_jackknife_validation():
    runs = [draw(t, 100, seed=2)[0] for t in TEMPS]
    with pytest.raises(ValueError, match="blocks"):
        wham_jackknife(runs, TEMPS, lambda e: 0.0, nblocks=1)
    with pytest.raises(ValueError, match="2 samples per block"):
        wham_jackknife(runs, TEMPS, lambda e: 0.0, nblocks=60)
    with pytest.raises(ValueError, match="align"):
        wham_jackknife(runs, TEMPS, lambda e, o: 0.0,
                       observables_by_run=[runs[0][:5]] * 3)
    with pytest.raises(ValueError, match="f_init"):
        wham(runs, TEMPS, f_init=np.zeros(5))
