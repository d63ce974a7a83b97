"""xla backend vs the independent naive implementation, plus physics checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, get_backend, lattice, observables
from ising_tpu.constants import BLACK, WHITE
from ising_tpu.models import ising
from naive_reference import naive_init, naive_step

jax.config.update("jax_numpy_rank_promotion", "raise")


def run_backend_steps(cfg, nsteps, jplanes_b=None, jplanes_w=None):
    be = get_backend(cfg)
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    b, w = be.encode(b, w)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    for step in range(nsteps):
        b = be.update_color(b, w, color=BLACK, thr10=thr, step=step,
                            src_up=w[-1:], src_dn=w[:1], jplanes=jplanes_b)
        w = be.update_color(w, b, color=WHITE, thr10=thr, step=step,
                            src_up=b[-1:], src_dn=b[:1], jplanes=jplanes_w)
    return be.decode(b, w)


@pytest.mark.parametrize("rng", ["philox", "philox7", "threefry",
                                 "threefry13"])
@pytest.mark.parametrize("shape", [(8, 8), (6, 16), (4, 24)])
def test_sweep_matches_naive(shape, rng):
    Y, X = shape
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.8, seed=777, backend="xla",
                    rng=rng)
    thr = ising.threshold_table(cfg.temperature)

    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, mode=rng)

    b, w = run_backend_steps(cfg, 3)
    got = np.asarray(lattice.compact_to_full(b, w))
    np.testing.assert_array_equal(got, full)


@pytest.mark.parametrize("rng", ["chacha8"])
@pytest.mark.parametrize("shape", [(8, 32), (6, 64)])
def test_sweep_matches_naive_chacha_u32(shape, rng):
    """chacha8 u32-draw contract vs the scalar reference (needs compact
    width % 16: one ChaCha block covers 16 sites)."""
    Y, X = shape
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.8, seed=777, backend="xla",
                    rng=rng)
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, mode="chacha8")
    b, w = run_backend_steps(cfg, 3)
    got = np.asarray(lattice.compact_to_full(b, w))
    np.testing.assert_array_equal(got, full)


@pytest.mark.parametrize("rng", ["philox7b", "threefry13b", "chacha8b"])
@pytest.mark.parametrize("shape", [(8, 64), (6, 128)])
def test_sweep_matches_naive_plane_modes(shape, rng):
    """Bit-plane rng contract (...b modes) against the scalar reference."""
    Y, X = shape
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.8, seed=321, backend="xla",
                    rng=rng)
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, mode=rng,
                          temp=cfg.temperature)
    b, w = run_backend_steps(cfg, 3)
    got = np.asarray(lattice.compact_to_full(b, w))
    np.testing.assert_array_equal(got, full)


def test_plane_mode_greedy_matches_naive():
    """T <= 0 quench under the bit-plane contract (coin = plane-0 bit)."""
    cfg = SimConfig(nrows=8, ncols=64, temp=0.0, seed=99, backend="xla",
                    rng="threefry13b")
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, 8, 64)
    for step in range(4):
        full = naive_step(full, thr, cfg.seed, step, mode="threefry13b",
                          temp=0.0)
    b, w = run_backend_steps(cfg, 4)
    got = np.asarray(lattice.compact_to_full(b, w))
    np.testing.assert_array_equal(got, full)


def test_plane_mode_sublattice_and_disorder_match_naive():
    """Plane modes compose with replica wrap and quenched disorder on xla."""
    Y, X = 8, 64
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.6, seed=55, backend="xla",
                    rng="threefry13b", xsl=8, ysl=4)
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, Y, X)
    for step in range(2):
        full = naive_step(full, thr, cfg.seed, step, mode="threefry13b",
                          temp=cfg.temperature, xsl=8, ysl=4)
    b, w = run_backend_steps(cfg, 2)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)

    cfg2 = SimConfig(nrows=Y, ncols=X, temp=1.6, seed=56, backend="xla",
                     rng="philox7b", j_prob=0.25)
    v, h = ising.generate_disorder_links(cfg2.seed, Y, X, 0.25)
    jb = tuple(lattice.links_to_color_planes(v, h, BLACK))
    jw = tuple(lattice.links_to_color_planes(v, h, WHITE))
    vn, hn = np.asarray(v), np.asarray(h)
    thr = ising.threshold_table(cfg2.temperature)
    full = naive_init(cfg2.seed, Y, X)
    for step in range(2):
        full = naive_step(full, thr, cfg2.seed, step, mode="philox7b",
                          temp=cfg2.temperature, v=vn, h=hn)
    b, w = run_backend_steps(cfg2, 2, jplanes_b=jb, jplanes_w=jw)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)


def test_sweep_matches_naive_near_critical():
    cfg = SimConfig(nrows=8, ncols=16, temp=2.3, seed=31337, backend="xla",
                    rng="philox")
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, 8, 16)
    for step in range(5):
        full = naive_step(full, thr, cfg.seed, step)
    b, w = run_backend_steps(cfg, 5)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)


def test_sublattice_matches_naive():
    Y, X = 8, 16
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.5, seed=5, backend="xla",
                    xsl=8, ysl=4, rng="philox")
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, xsl=8, ysl=4)
    b, w = run_backend_steps(cfg, 3)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)


def test_disorder_matches_naive():
    Y, X = 8, 16
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.2, seed=99, backend="xla",
                    j_prob=0.4, rng="philox")
    thr = ising.threshold_table(cfg.temperature)
    v, h = ising.generate_disorder_links(cfg.seed, Y, X, cfg.j_prob)
    vn, hn = np.asarray(v), np.asarray(h)

    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, v=vn, h=hn)

    jb = lattice.links_to_color_planes(v, h, BLACK)
    jw = lattice.links_to_color_planes(v, h, WHITE)
    b, w = run_backend_steps(cfg, 3, jplanes_b=jb, jplanes_w=jw)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)


def _equilibrate_and_sample(cfg, nsteps, nsamples, sample_every):
    """Run nsteps from an all-up start, then sample m and E periodically."""
    be = get_backend(cfg)
    ch = cfg.ncols // 2
    b = jnp.ones((cfg.nrows, ch), jnp.uint8)
    w = jnp.ones((cfg.nrows, ch), jnp.uint8)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))

    @jax.jit
    def steps(b, w, step0, n):
        def body(i, bw):
            bb, ww = bw
            s = step0 + i
            bb = be.update_color(bb, ww, color=BLACK, thr10=thr, step=s,
                                 src_up=ww[-1:], src_dn=ww[:1])
            ww = be.update_color(ww, bb, color=WHITE, thr10=thr, step=s,
                                 src_up=bb[-1:], src_dn=bb[:1])
            return bb, ww
        return jax.lax.fori_loop(0, n, body, (b, w))

    b, w = steps(b, w, 0, nsteps)
    ms, es = [], []
    t = nsteps
    for _ in range(nsamples):
        b, w = steps(b, w, t, sample_every)
        t += sample_every
        ms.append(observables.magnetization(b, w))
        es.append(observables.energy_per_spin(b, w))
    return float(np.mean(ms)), float(np.mean(es))


def test_equilibrium_matches_onsager_lowT():
    """Equilibrium m and E at T=1.5 (0.66 Tc) vs the exact solution."""
    cfg = SimConfig(nrows=64, ncols=64, temp=1.5, seed=3, backend="xla")
    m, e = _equilibrate_and_sample(cfg, 300, 20, 5)
    assert abs(m - ising.onsager_magnetization(1.5)) < 0.02   # 0.9865
    assert abs(e - ising.onsager_energy(1.5)) < 0.03          # -1.9536


def test_equilibrium_disorders_highT():
    """Well above Tc an ordered start melts: small m, E near exact value."""
    cfg = SimConfig(nrows=64, ncols=64, temp=6.0, seed=4, backend="xla")
    m, e = _equilibrate_and_sample(cfg, 200, 20, 5)
    assert m < 0.1
    assert abs(e - ising.onsager_energy(6.0)) < 0.05          # -0.3427


def test_observables_known_configs():
    Y, X = 8, 16
    ones = jnp.ones((Y, X // 2), jnp.uint8)
    zeros = jnp.zeros((Y, X // 2), jnp.uint8)
    # all up: m=1, E/N=-2, corr=1
    assert observables.magnetization(ones, ones) == 1.0
    assert observables.energy_per_spin(ones, ones) == -2.0
    np.testing.assert_allclose(
        observables.correlation(ones, ones, corr_len=4), np.ones(4))
    # perfect antiferromagnet (all black up, all white down): m=0, E/N=+2
    assert observables.magnetization(ones, zeros) == 0.0
    assert observables.energy_per_spin(ones, zeros) == 2.0
    c = observables.correlation(ones, zeros, corr_len=4)
    np.testing.assert_allclose(c, [-1.0, 1.0, -1.0, 1.0])


def test_energy_matches_naive_count():
    rs = np.random.RandomState(0)
    full = rs.randint(0, 2, size=(6, 8)).astype(np.uint8)
    from ising_tpu.lattice import full_to_compact
    b, w = full_to_compact(jnp.asarray(full))
    s = 2.0 * full - 1.0
    e = 0.0
    for y in range(6):
        for x in range(8):
            e -= s[y, x] * (s[y, (x + 1) % 8] + s[(y + 1) % 6, x])
    assert observables.energy_per_spin(b, w) == pytest.approx(e / 48.0)
