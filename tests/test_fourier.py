"""Fourier-magnetization partials and the second-moment correlation length.

Column up counts are checked against full-plane numpy reductions, the k1
amplitude against a direct FFT of the materialized plane, and the driver
path across backends (bit1's word-domain column counts vs xla's byte
planes). New capability beyond the reference, whose only length observable
is the direct-space correlation function (optimized/main.cu:870-1070).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, analysis, observables
from ising_tpu.driver import Simulation
from ising_tpu.lattice import compact_to_full, full_to_compact


def random_full(Y, X, seed):
    rs = np.random.RandomState(seed)
    return rs.randint(0, 2, size=(Y, X)).astype(np.uint8)


@pytest.mark.parametrize("shape,seed", [((8, 16), 0), ((6, 24), 1),
                                        ((16, 32), 2)])
def test_col_up_counts_match_full(shape, seed):
    full = random_full(*shape, seed)
    b, w = full_to_compact(jnp.asarray(full))
    np.testing.assert_array_equal(
        np.asarray(observables.col_up_counts(b, w)),
        full.sum(axis=0, dtype=np.uint32))


def test_col_up_counts_row_chunking_exact():
    full = random_full(24, 16, 3)
    b, w = full_to_compact(jnp.asarray(full))
    one = np.asarray(observables.col_up_counts(b, w))
    np.testing.assert_array_equal(
        np.asarray(observables.col_up_counts(b, w, row_chunk=4)), one)
    # _via path: a decode callback slicing the same planes
    via = observables.col_up_counts_via(
        lambda r, n: (b[r:r + n], w[r:r + n]), 24, row_chunk=6)
    np.testing.assert_array_equal(np.asarray(via), one)


def test_bit1_col_up_counts_match_decoded():
    from ising_tpu.ops.pallas_bit1 import pack_bits1
    full = random_full(8, 128, 4)
    b, w = full_to_compact(jnp.asarray(full))
    bw, ww = pack_bits1(b), pack_bits1(w)
    np.testing.assert_array_equal(
        np.asarray(observables.bit1_col_up_counts(bw, ww)),
        np.asarray(observables.col_up_counts(b, w)))
    np.testing.assert_array_equal(
        np.asarray(observables.bit1_col_up_counts(bw, ww, row_chunk=4)),
        np.asarray(observables.col_up_counts(b, w)))


def test_kmin_mag2_matches_fft():
    full = random_full(12, 20, 5)
    s = 2.0 * full - 1.0
    f = np.fft.fft2(s)
    b, w = full_to_compact(jnp.asarray(full))
    cols = np.asarray(observables.col_up_counts(b, w), np.int64)
    rows = np.asarray(observables.row_up_counts(b, w), np.int64)
    np.testing.assert_allclose(analysis.kmin_mag2(cols, full.shape[0]),
                               abs(f[0, 1]) ** 2, rtol=1e-12)
    np.testing.assert_allclose(analysis.kmin_mag2(rows, full.shape[1]),
                               abs(f[1, 0]) ** 2, rtol=1e-12)
    # structure_factor agrees at the same wavevectors (S = |F|^2 / N)
    S = analysis.structure_factor(s)
    np.testing.assert_allclose(S[0, 1] * s.size, abs(f[0, 1]) ** 2,
                               rtol=1e-12)


def test_second_moment_xi_limits():
    assert analysis.second_moment_xi(1.0, 0.0, 64) == float("inf")
    # sampling noise driving the bracket negative clamps at 0
    assert analysis.second_moment_xi(1.0, 2.0, 64) == 0.0
    # free-field sanity: S0/Sk = 1 + (2 sin(pi/L) xi)^2 inverts exactly
    L, xi = 128, 7.5
    import math
    ratio = 1.0 + (2.0 * math.sin(math.pi / L) * xi) ** 2
    np.testing.assert_allclose(
        analysis.second_moment_xi(ratio, 1.0, L), xi, rtol=1e-12)


def test_correlation_length_jackknife_finite():
    rs = np.random.RandomState(11)
    m0 = 100.0 + rs.rand(16)
    mk = 10.0 + rs.rand(16)
    xi, err = analysis.correlation_length(m0, mk, 64)
    assert np.isfinite(xi) and xi > 0 and err >= 0


@pytest.mark.parametrize("backend", ["xla", "bit1"])
def test_driver_fourier_partials(backend):
    cfg = SimConfig(nrows=16, ncols=128, temp=2.0, seed=99, backend=backend)
    sim = Simulation(cfg)
    sim.advance(3)
    rows, cols = sim.fourier_partials()
    full = np.asarray(compact_to_full(*sim.bits()))
    np.testing.assert_array_equal(rows, full.sum(axis=1, dtype=np.int64))
    np.testing.assert_array_equal(cols, full.sum(axis=0, dtype=np.int64))


def test_driver_fourier_partials_rejects_replica_mode():
    cfg = SimConfig(nrows=16, ncols=64, temp=2.0, seed=7, backend="xla",
                    xsl=16, ysl=8)
    sim = Simulation(cfg)
    with pytest.raises(ValueError, match="full-lattice"):
        sim.fourier_partials()


def test_fourier_partials_sharded_match_single():
    base = dict(nrows=32, ncols=64, temp=2.2, seed=17, backend="xla")
    s1 = Simulation(SimConfig(ndev=1, **base))
    s8 = Simulation(SimConfig(ndev=8, **base))
    s1.advance(3), s8.advance(3)
    r1, c1 = s1.fourier_partials()
    r8, c8 = s8.fourier_partials()
    np.testing.assert_array_equal(r1, r8)
    np.testing.assert_array_equal(c1, c8)


def test_xi_physics_smoke():
    """Disordered phase far above Tc: xi must come out tiny vs L.

    (At T = 3.5 the infinite-volume xi is ~1 lattice unit.)"""
    cfg = SimConfig(nrows=64, ncols=64, temp=3.5, seed=31, backend="xla")
    sim = Simulation(cfg)
    sim.advance(60)
    m0s, mks = [], []
    for _ in range(12):
        sim.advance(5)
        rows, cols = sim.fourier_partials()
        n_up = int(cols.sum())
        m0s.append(float(2 * n_up - cfg.nspins) ** 2)
        mks.append(analysis.kmin_mag2(cols, cfg.nrows))
    xi, _ = analysis.correlation_length(m0s, mks, cfg.ncols)
    assert 0.0 <= xi < 12.0
