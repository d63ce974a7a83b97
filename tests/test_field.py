"""Uniform external field h (beyond the reference, which has no field term).

The field enters only through the host-side acceptance table, but it breaks
the b <-> (4-n) mirror symmetry the 3-threshold kernels exploit, so it is
gated to the xla backend's full-table path. Checks: exact table identities,
bit-exact sweep parity against the independent scalar reference (whose u32
accept already indexes the full 2x5 table), the exact spin-flip/field-
reversal symmetry of whole trajectories, field-aware energy, and config
fencing.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, get_backend, lattice
from ising_tpu.constants import BLACK, WHITE
from ising_tpu.driver import Simulation
from ising_tpu.models import ising
from naive_reference import naive_init, naive_step


def test_table_reduces_to_zero_field():
    for T in (0.0, 1.5, 2.269185, 10.0):
        np.testing.assert_array_equal(ising.threshold_table(T, 0.0),
                                      ising.threshold_table(T))


def test_probabilities_formula():
    T, h = 1.7, 0.6
    p = ising.acceptance_probabilities(T, h)
    for b in range(2):
        for n in range(5):
            de = 2.0 * (2 * b - 1) * ((2 * n - 4) + h)
            assert p[b, n] == math.exp(-de / T)


def test_field_reversal_symmetry_of_table():
    # p[b][n](h) == p[1-b][4-n](-h) EXACTLY (float negation is exact):
    # complementing all spins while negating the field is a symmetry of
    # the dynamics, threshold tables included.
    for T, h in ((2.0, 0.8), (1.1, -1.7), (0.0, 0.5)):
        a = ising.threshold_table(T, h)
        b = ising.threshold_table(T, -h)
        np.testing.assert_array_equal(a.reshape(2, 5),
                                      b.reshape(2, 5)[::-1, ::-1])


def test_greedy_quench_with_field():
    # T <= 0: accept iff dE < 0, coin on dE == 0. With h = 2 the b=1, n=1
    # class has dE = 2*((-2) + 2) = 0 -> p = 0.5.
    p = ising.acceptance_probabilities(0.0, 2.0)
    assert p[1, 1] == 0.5 and p[1, 0] == 1.0 and p[1, 2] == 0.0


def run_xla_steps(cfg, nsteps):
    be = get_backend(cfg)
    b, w = be.encode(*lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols))
    thr = jnp.asarray(ising.threshold_table(cfg.temperature, cfg.field))
    for step in range(nsteps):
        b = be.update_color(b, w, color=BLACK, thr10=thr, step=step,
                            src_up=w[-1:], src_dn=w[:1])
        w = be.update_color(w, b, color=WHITE, thr10=thr, step=step,
                            src_up=b[-1:], src_dn=b[:1])
    return be.decode(b, w)


@pytest.mark.parametrize("h", [0.7, -1.3, 2.0])
@pytest.mark.parametrize("rng", ["threefry13", "philox"])
def test_field_sweep_matches_naive(h, rng):
    Y, X = 8, 16
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.8, seed=909, backend="xla",
                    rng=rng, field=h)
    thr = ising.threshold_table(cfg.temperature, h)
    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, mode=rng)
    b, w = run_xla_steps(cfg, 3)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)


@pytest.mark.parametrize("backend", ["dense", "packed"])
def test_field_backends_match_xla(backend):
    """dense always indexes all 10 classes; packed's full-table path
    selects per own-bit between the two 5-entry chains — both must be
    bit-identical to xla's full-table trajectories."""
    base = dict(nrows=16, ncols=32, temp=1.9, seed=31, field=-0.7)
    sx = Simulation(SimConfig(backend="xla", **base))
    sd = Simulation(SimConfig(backend=backend, **base))
    sx.advance(4), sd.advance(4)
    np.testing.assert_array_equal(np.asarray(sx.bits()[0]),
                                  np.asarray(sd.bits()[0]))
    np.testing.assert_array_equal(np.asarray(sx.bits()[1]),
                                  np.asarray(sd.bits()[1]))


@pytest.mark.parametrize("extra", [dict(), dict(j_prob=0.3),
                                   dict(xsl=8, ysl=8),
                                   dict(temp=0.0, field=2.0)])
def test_field_packed_matches_xla_variants(extra):
    """packed full-table accept across its feature matrix: disorder,
    sub-lattice replicas, and the T = 0 greedy quench (the full-table
    path needs no separate greedy branch — the table encodes it)."""
    base = dict(nrows=16, ncols=64, temp=1.7, seed=77, field=0.9)
    base.update(extra)
    sx = Simulation(SimConfig(backend="xla", **base))
    sp = Simulation(SimConfig(backend="packed", **base))
    sx.advance(3), sp.advance(3)
    np.testing.assert_array_equal(np.asarray(sx.bits()[0]),
                                  np.asarray(sp.bits()[0]))
    np.testing.assert_array_equal(np.asarray(sx.bits()[1]),
                                  np.asarray(sp.bits()[1]))


@pytest.mark.parametrize("ndev", [1, 8])
def test_field_simulation_matches_naive(ndev):
    cfg = SimConfig(nrows=16, ncols=16, temp=2.2, seed=11, backend="xla",
                    field=0.9, ndev=ndev)
    sim = Simulation(cfg)
    sim.advance(3)
    thr = ising.threshold_table(cfg.temperature, cfg.field)
    full = naive_init(cfg.seed, 16, 16)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, mode=cfg.rng)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(*sim.bits())), full)


def test_field_with_disorder_matches_naive():
    Y, X = 8, 16
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.6, seed=23, backend="xla",
                    field=-0.8, j_prob=0.4)
    sim = Simulation(cfg)
    sim.advance(3)
    thr = ising.threshold_table(cfg.temperature, cfg.field)
    v, h = (np.asarray(p) for p in ising.generate_disorder_links(
        cfg.seed, Y, X, cfg.j_prob))
    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step, v=v, h=h, mode=cfg.rng)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(*sim.bits())), full)


def test_field_reversal_trajectory_symmetry():
    """Complement the start state and negate h: the whole trajectory
    complements, bit for bit (same draws, exactly mirrored thresholds)."""
    base = dict(nrows=8, ncols=32, temp=1.9, seed=5, backend="xla",
                rng="chacha8")
    b0, w0 = lattice.init_bits(5, 8, 32)
    s_pos = Simulation(SimConfig(field=1.1, **base), state=(b0, w0))
    s_neg = Simulation(SimConfig(field=-1.1, **base),
                       state=(b0 ^ jnp.uint8(1), w0 ^ jnp.uint8(1)))
    s_pos.advance(4), s_neg.advance(4)
    bp, wp = s_pos.bits()
    bn, wn = s_neg.bits()
    np.testing.assert_array_equal(np.asarray(bp) ^ 1, np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(wp) ^ 1, np.asarray(wn))


def test_energy_includes_field_term():
    cfg = SimConfig(nrows=8, ncols=16, temp=2.5, seed=3, backend="xla",
                    field=0.6)
    sim = Simulation(cfg)
    sim.advance(2)
    s = 2.0 * np.asarray(lattice.compact_to_full(*sim.bits()),
                         np.float64) - 1.0
    bonds = float((s * np.roll(s, -1, axis=0)).sum()
                  + (s * np.roll(s, -1, axis=1)).sum())
    expect = -(bonds + cfg.field * float(s.sum())) / cfg.nspins
    np.testing.assert_allclose(sim.energy(), expect, rtol=1e-12)


def test_field_config_fencing():
    # bit1 needs the bit-serial accept (plane/hw modes), not u32 modes.
    with pytest.raises(ValueError, match="bit-serial"):
        SimConfig(nrows=8, ncols=64, temp=2.0, backend="bit1", field=0.5)
    # dense/packed full-table paths consume u32 draws only.
    with pytest.raises(ValueError, match="u32"):
        SimConfig(nrows=8, ncols=64, temp=2.0, backend="packed",
                  rng="chacha8b", field=0.5)
    # mxu has no field path at all.
    with pytest.raises(ValueError, match="mxu"):
        SimConfig(nrows=8, ncols=256, temp=2.0, backend="mxu", field=0.5)
    # Legal combinations construct fine: bit1 + plane/hw, xla + anything.
    SimConfig(nrows=8, ncols=64, temp=2.0, backend="bit1", rng="chacha8b",
              field=0.5)
    SimConfig(nrows=8, ncols=64, temp=2.0, backend="bit1", rng="hw",
              field=0.5)
    SimConfig(nrows=8, ncols=64, temp=2.0, backend="xla", rng="philox7b",
              field=0.5)
    from ising_tpu.tempering import ParallelTempering
    with pytest.raises(ValueError, match="field"):
        ParallelTempering(SimConfig(nrows=8, ncols=16, temp=2.0,
                                    backend="xla", field=0.5), [1.5, 2.0])


@pytest.mark.parametrize("rng,h", [("philox7b", 0.7), ("chacha8b", -1.3)])
def test_field_plane_mode_matches_naive(rng, h):
    """xla + bit-plane rng + field: the 10-class bit-serial accept against
    the independent scalar reference's own 10-class table. (2 steps, one
    h per rng: the scalar plane reference costs ~17 draws/site/sweep.)"""
    Y, X = 8, 64
    cfg = SimConfig(nrows=Y, ncols=X, temp=1.8, seed=909, backend="xla",
                    rng=rng, field=h)
    sim = Simulation(cfg)
    sim.advance(2)
    full = naive_init(cfg.seed, Y, X)
    for step in range(2):
        full = naive_step(full, None, cfg.seed, step, mode=rng,
                          temp=cfg.temperature, field=h)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(*sim.bits())), full)


@pytest.mark.parametrize("extra", [dict(), dict(j_prob=0.3),
                                   dict(temp=0.0, field=2.0),
                                   dict(xsl=4, ysl=8)])
def test_field_bit1_matches_xla_planes(extra):
    """bit1 + bit-plane rng + field across its feature matrix (disorder,
    the T = 0 greedy-with-field table, sub-lattice replicas) must be
    bit-identical to the xla backend's 10-class plane path."""
    base = dict(nrows=16, ncols=128, temp=1.7, seed=77, rng="threefry13b",
                field=0.9)
    base.update(extra)
    sx = Simulation(SimConfig(backend="xla", **base))
    sb = Simulation(SimConfig(backend="bit1", **base))
    sx.advance(3), sb.advance(3)
    np.testing.assert_array_equal(np.asarray(sx.bits()[0]),
                                  np.asarray(sb.bits()[0]))
    np.testing.assert_array_equal(np.asarray(sx.bits()[1]),
                                  np.asarray(sb.bits()[1]))


def test_field_bit1_matches_naive():
    Y, X = 8, 64
    cfg = SimConfig(nrows=Y, ncols=X, temp=2.1, seed=5, backend="bit1",
                    rng="chacha8b", field=-0.6)
    sim = Simulation(cfg)
    sim.advance(3)
    full = naive_init(cfg.seed, Y, X)
    for step in range(3):
        full = naive_step(full, None, cfg.seed, step, mode=cfg.rng,
                          temp=cfg.temperature, field=cfg.field)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(*sim.bits())), full)


@pytest.mark.parametrize("ndev", [1, 8])
def test_field_bit1_sharded_matches_single(ndev):
    base = dict(nrows=32, ncols=128, temp=1.9, seed=13, backend="bit1",
                rng="philox7b", field=0.8)
    s1 = Simulation(SimConfig(ndev=1, **base))
    sn = Simulation(SimConfig(ndev=ndev, **base))
    s1.advance(3), sn.advance(3)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(sn.bits()[0]))
    np.testing.assert_array_equal(np.asarray(s1.bits()[1]),
                                  np.asarray(sn.bits()[1]))


def test_set_field_bit1_matches_fresh_sim():
    """set_field on a static-accept backend (bit1: thresholds are baked
    into the kernel) rebuilds the stepper and continues exactly like a sim
    constructed at the new field from the same state."""
    base = dict(nrows=8, ncols=64, temp=2.0, seed=13, backend="bit1",
                rng="chacha8b")
    s = Simulation(SimConfig(field=0.4, **base))
    s.advance(2)
    state = tuple(np.asarray(p).copy() for p in s.bits())
    s.set_field(-1.1)
    s.advance(3)
    f = Simulation(SimConfig(field=-1.1, **base), state=state, step0=2)
    f.advance(3)
    np.testing.assert_array_equal(np.asarray(s.bits()[0]),
                                  np.asarray(f.bits()[0]))
    np.testing.assert_array_equal(np.asarray(s.bits()[1]),
                                  np.asarray(f.bits()[1]))


def test_field_checkpoint_resume(tmp_path):
    cfg = SimConfig(nrows=8, ncols=16, temp=2.1, seed=41, backend="xla",
                    field=1.3)
    ref = Simulation(cfg)
    ref.advance(6)
    sim = Simulation(cfg)
    sim.advance(3)
    path = str(tmp_path / "f.ckpt")
    sim.checkpoint(path)
    res = Simulation.from_checkpoint(path)
    assert res.cfg.field == 1.3
    res.advance(3)
    np.testing.assert_array_equal(np.asarray(ref.bits()[0]),
                                  np.asarray(res.bits()[0]))
    np.testing.assert_array_equal(np.asarray(ref.bits()[1]),
                                  np.asarray(res.bits()[1]))


def test_set_field_matches_fresh_sim():
    """set_field (incl. the zero-crossing stepper rebuild) continues
    exactly like a sim constructed at the new field from the same state."""
    base = dict(nrows=8, ncols=16, temp=2.0, seed=13, backend="xla")
    s = Simulation(SimConfig(field=0.0, **base))
    s.advance(2)
    state = tuple(np.asarray(p).copy() for p in s.bits())
    s.set_field(0.7)  # 0 -> nonzero: flips the full-table select
    s.advance(3)
    f = Simulation(SimConfig(field=0.7, **base), state=state, step0=2)
    f.advance(3)
    np.testing.assert_array_equal(np.asarray(s.bits()[0]),
                                  np.asarray(f.bits()[0]))
    np.testing.assert_array_equal(np.asarray(s.bits()[1]),
                                  np.asarray(f.bits()[1]))
    # and back to zero (rebuilds again, mirror path)
    s.set_field(0.0)
    s.advance(2)
    f.set_field(0.0)
    f.advance(2)
    np.testing.assert_array_equal(np.asarray(s.bits()[0]),
                                  np.asarray(f.bits()[0]))


def test_field_polarizes_magnetization():
    """Physics smoke: h > 0 above Tc drives a clearly positive mean spin."""
    cfg = SimConfig(nrows=32, ncols=32, temp=3.0, seed=8, backend="xla",
                    field=1.0)
    sim = Simulation(cfg)
    sim.advance(200)
    m = sim.measure()
    m_signed = (m["up"] - m["down"]) / cfg.nspins
    assert m_signed > 0.3
