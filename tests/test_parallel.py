"""Multi-chip equivalence on the virtual 8-device CPU mesh.

The key invariant (SURVEY.md §4): with the counter-based RNG, the trajectory
is bit-identical for any device count — the N-vs-1 device equivalence the
reference only offers via --use-common-seed.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ising_tpu import SimConfig, get_backend, lattice, observables
from ising_tpu.models import ising
from ising_tpu.parallel import make_mesh, make_sharded_stepper


def run(cfg, nsteps):
    be = get_backend(cfg)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    b, w = be.encode(b, w)
    shardings, step_n = make_sharded_stepper(cfg, be)
    if shardings["plane"] is not None:
        b = jax.device_put(b, shardings["plane"])
        w = jax.device_put(w, shardings["plane"])
    b, w = step_n(b, w, thr, jnp.uint32(0), nsteps)
    return be.decode(b, w)


@pytest.mark.parametrize("ndev", [2, 4, 8])
def test_sharded_matches_single(ndev):
    base = dict(nrows=32, ncols=32, temp=2.0, seed=12345, backend="xla")
    b1, w1 = run(SimConfig(ndev=1, **base), 4)
    bn, wn = run(SimConfig(ndev=ndev, **base), 4)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(wn))


def test_sharded_matches_naive():
    from naive_reference import naive_init, naive_step
    cfg = SimConfig(nrows=8, ncols=16, temp=1.7, seed=42, backend="xla",
                    ndev=4, rng="philox")
    thr = ising.threshold_table(cfg.temperature)
    full = naive_init(cfg.seed, 8, 16)
    for step in range(3):
        full = naive_step(full, thr, cfg.seed, step)
    b, w = run(cfg, 3)
    np.testing.assert_array_equal(
        np.asarray(lattice.compact_to_full(b, w)), full)


def test_sharded_observables():
    """An ordered state at low T stays ordered under the sharded stepper."""
    cfg = SimConfig(nrows=64, ncols=64, temp=1.0, seed=7, backend="xla", ndev=8)
    be = get_backend(cfg)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    ch = cfg.ncols // 2
    b = jnp.ones((cfg.nrows, ch), jnp.uint8)
    w = jnp.ones((cfg.nrows, ch), jnp.uint8)
    shardings, step_n = make_sharded_stepper(cfg, be)
    b = jax.device_put(b, shardings["plane"])
    w = jax.device_put(w, shardings["plane"])
    b, w = step_n(b, w, thr, jnp.uint32(0), 60)
    m = observables.magnetization(*get_backend(cfg).decode(b, w))
    # Onsager magnetization at T=1.0 is ~0.999; allow finite-size noise.
    assert m > 0.99


def test_sharded_sublattice():
    base = dict(nrows=32, ncols=32, temp=1.5, seed=3, backend="xla",
                xsl=16, ysl=8)
    b1, w1 = run(SimConfig(ndev=1, **base), 3)
    bn, wn = run(SimConfig(ndev=4, **base), 3)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(wn))


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (8,)


@pytest.mark.parametrize("backend", ["packed", "dense"])
def test_sharded_pallas_backends_match_single(backend):
    base = dict(nrows=32, ncols=64, temp=1.9, seed=31, backend=backend)
    b1, w1 = run(SimConfig(ndev=1, **base), 3)
    bn, wn = run(SimConfig(ndev=4, **base), 3)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(wn))


def test_sharded_packed_matches_xla():
    base = dict(nrows=32, ncols=64, temp=1.7, seed=8)
    bx, wx = run(SimConfig(ndev=4, backend="xla", **base), 3)
    bp, wp = run(SimConfig(ndev=4, backend="packed", **base), 3)
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(wx), np.asarray(wp))


@pytest.mark.parametrize("backend", ["xla", "packed", "bit1"])
def test_sharded_disorder_matches_single(backend):
    """Quenched disorder planes must shard correctly with the lattice."""
    from ising_tpu.driver import Simulation
    base = dict(nrows=32, ncols=64, temp=1.4, seed=23, backend=backend,
                j_prob=0.35, niters=3)
    s1 = Simulation(SimConfig(ndev=1, **base)); s1.advance(3)
    s4 = Simulation(SimConfig(ndev=4, **base)); s4.advance(3)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s4.bits()[0]))
    np.testing.assert_array_equal(np.asarray(s1.bits()[1]),
                                  np.asarray(s4.bits()[1]))


def test_sharded_replica_packed_matches_single():
    from ising_tpu.driver import Simulation
    base = dict(nrows=32, ncols=128, temp=1.6, seed=29, backend="packed",
                xsl=16, ysl=8, niters=3)
    s1 = Simulation(SimConfig(ndev=1, **base)); s1.advance(3)
    s4 = Simulation(SimConfig(ndev=4, **base)); s4.advance(3)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s4.bits()[0]))


def test_hw_modes_smoke():
    """hw mode: not bit-reproducible, but must stay physical."""
    from ising_tpu.driver import Simulation
    from ising_tpu import observables
    for rng in ("hw",):
        cfg = SimConfig(nrows=64, ncols=64, temp=1.0, seed=5,
                        backend="packed", rng=rng, niters=1)
        sim = Simulation(cfg)
        ch = cfg.ncols // 2
        import jax.numpy as jnp
        sim.black, sim.white = sim.backend.encode(
            jnp.ones((64, ch), jnp.uint8), jnp.ones((64, ch), jnp.uint8))
        sim.advance(40)
        m = observables.magnetization(*sim.bits())
        assert m > 0.99, f"rng={rng}: ordered state melted ({m})"


def test_initialize_multihost_passthrough(monkeypatch):
    """initialize_multihost must forward its kwargs to jax.distributed
    (the DCN multi-host hook; single-host CI can only verify the wiring)."""
    import ising_tpu.parallel.mesh as mesh_mod
    called = {}
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.update(kw))
    mesh_mod.initialize_multihost(coordinator_address="host:1234",
                                  num_processes=2, process_id=0)
    assert called == {"coordinator_address": "host:1234",
                      "num_processes": 2, "process_id": 0}


@pytest.mark.parametrize("backend", ["xla", "packed"])
def test_halo_overlap_matches_plain(backend):
    """Interior/boundary split sweeps must be bit-identical to the plain
    sharded path (halo exchange overlapped with interior compute)."""
    base = dict(nrows=128, ncols=64, temp=1.9, seed=77, backend=backend,
                ndev=4)
    b1, w1 = run(SimConfig(halo_overlap=False, **base), 3)
    b2, w2 = run(SimConfig(halo_overlap=True, **base), 3)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_halo_overlap_disorder_matches_plain():
    from ising_tpu.driver import Simulation
    base = dict(nrows=128, ncols=64, temp=1.4, seed=5, backend="xla",
                j_prob=0.3, ndev=4, niters=2)
    s1 = Simulation(SimConfig(halo_overlap=False, **base)); s1.advance(2)
    s2 = Simulation(SimConfig(halo_overlap=True, **base)); s2.advance(2)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s2.bits()[0]))
    np.testing.assert_array_equal(np.asarray(s1.bits()[1]),
                                  np.asarray(s2.bits()[1]))


def test_halo_overlap_validation():
    with pytest.raises(ValueError):
        make_sharded_stepper(
            SimConfig(nrows=16, ncols=32, ndev=4, halo_overlap=True),
            get_backend(SimConfig(nrows=16, ncols=32, ndev=4)))


def test_sharded_bit1_matches_single_and_xla():
    base = dict(nrows=32, ncols=128, temp=1.7, seed=8)
    b1, w1 = run(SimConfig(ndev=1, backend="bit1", **base), 3)
    bn, wn = run(SimConfig(ndev=4, backend="bit1", **base), 3)
    bx, wx = run(SimConfig(ndev=4, backend="xla", **base), 3)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(wx), np.asarray(wn))


@pytest.mark.parametrize("rng", ["threefry13b", "chacha8b"])
def test_sharded_plane_mode_matches_single_and_xla(rng):
    """Bit-plane rng contract is sharding-independent (global-row counters)."""
    base = dict(nrows=32, ncols=128, temp=1.7, seed=9, rng=rng)
    b1, w1 = run(SimConfig(ndev=1, backend="bit1", **base), 3)
    bn, wn = run(SimConfig(ndev=4, backend="bit1", **base), 3)
    bx, wx = run(SimConfig(ndev=8, backend="xla", **base), 3)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bn))
    np.testing.assert_array_equal(np.asarray(wx), np.asarray(wn))
