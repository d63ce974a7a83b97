"""2-D block decomposition probe: draw-contract equality + mesh parity.

The probe's verdict is NO-GO for production (PERF.md "2-D block
decomposition: go/no-go"); these tests lock in what the prototype proves —
column sharding CAN preserve the bit-identity contract — and pin the
lane-redundancy accounting the no-go rests on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ising_tpu import SimConfig, get_backend, lattice
from ising_tpu.models import ising
from ising_tpu.parallel import make_sharded_stepper
from ising_tpu.parallel.block2d import (draws_block, make_block2d_stepper,
                                        make_mesh2d)
from ising_tpu.rng import TAG_SWEEP, counter_color_draws

MODES = ["philox", "threefry13", "chacha8"]


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("col0,ncl", [(0, 8), (8, 8), (24, 8), (0, 16),
                                      (16, 16), (0, 32), (4, 4)])
def test_draws_block_matches_full_row(mode, col0, ncl):
    """Block draws == the same columns of the full-row contract draws."""
    ch, rows, row0 = 32, 6, 10
    g = ch // {"philox": 4, "threefry": 2, "chacha": 16}[
        mode.rstrip("0123456789")]
    if not (ncl % g == 0 or g % ncl == 0) or col0 % ncl:
        pytest.skip("unsupported block geometry")
    full = np.asarray(counter_color_draws(
        mode, 999, rows, ch, step=3, tag=TAG_SWEEP | 1, row0=row0,
        row_stride=ch))
    blk = np.asarray(draws_block(
        mode, 999, rows, ncl, step=3, tag=TAG_SWEEP | 1, row0=row0,
        col0=col0, ch_global=ch))
    np.testing.assert_array_equal(blk, full[:, col0:col0 + ncl])


@pytest.mark.parametrize("mode", MODES)
@pytest.mark.parametrize("mesh_shape", [(2, 4), (4, 2), (1, 8), (8, 1),
                                        (2, 2)])
def test_block2d_matches_single_device(mode, mesh_shape):
    """2-D sharded trajectories == 1-device == 1-D sharded, bit for bit."""
    nrows, ncols, steps = 32, 64, 6
    cfg1 = SimConfig(nrows=nrows, ncols=ncols, temp=1.8, seed=31,
                     backend="xla", rng=mode)
    be = get_backend(cfg1)
    thr = jnp.asarray(ising.threshold_table(cfg1.temperature))
    b0, w0 = be.encode(*lattice.init_bits(cfg1.seed, nrows, ncols))
    b0, w0 = np.asarray(b0), np.asarray(w0)  # steppers donate their inputs

    _, step1 = make_sharded_stepper(cfg1, be)
    b1, w1 = step1(jnp.asarray(b0), jnp.asarray(w0), thr, jnp.uint32(0),
                   steps)

    mesh = make_mesh2d(*mesh_shape)
    sh, step2 = make_block2d_stepper(cfg1, be, mesh)
    b2 = jax.device_put(b0, sh["plane"])
    w2 = jax.device_put(w0, sh["plane"])
    b2, w2 = step2(b2, w2, thr, jnp.uint32(0), steps)

    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2),
                                  err_msg=f"{mode} {mesh_shape} black")
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2),
                                  err_msg=f"{mode} {mesh_shape} white")


def test_block2d_scope_fences():
    cfg = SimConfig(nrows=32, ncols=64, temp=1.8, backend="xla", rng="hw")
    be = get_backend(cfg)
    with pytest.raises(NotImplementedError, match="counter contracts"):
        draws_block("hw", 1, 4, 8, step=0, tag=0, row0=0, col0=0,
                    ch_global=32)
    cfgp = SimConfig(nrows=32, ncols=64, temp=1.8, backend="packed")
    with pytest.raises(NotImplementedError, match="xla backend"):
        make_block2d_stepper(cfgp, get_backend(cfgp), make_mesh2d(2, 2))
