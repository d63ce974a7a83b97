"""Compact <-> full lattice mapping and initialization."""

import numpy as np
import jax.numpy as jnp

from ising_tpu import lattice
from naive_reference import naive_init, site_color


def test_round_trip():
    rs = np.random.RandomState(3)
    full = rs.randint(0, 2, size=(6, 16)).astype(np.uint8)
    b, w = lattice.full_to_compact(jnp.asarray(full))
    back = np.asarray(lattice.compact_to_full(b, w))
    np.testing.assert_array_equal(back, full)


def test_storage_convention():
    # black[y, j] holds s[y, 2j + (y % 2)]
    full = np.arange(4 * 8).reshape(4, 8).astype(np.uint8)
    b, w = lattice.full_to_compact(jnp.asarray(full))
    b, w = np.asarray(b), np.asarray(w)
    for y in range(4):
        for j in range(4):
            assert b[y, j] == full[y, 2 * j + (y % 2)]
            assert w[y, j] == full[y, 2 * j + ((y + 1) % 2)]


def test_color_convention_matches_naive():
    for y in range(4):
        for x in range(8):
            j = x // 2
            color = site_color(y, x)
            # site (y,x) lands in the plane named by its color
            if color == 0:
                assert 2 * j + (y % 2) == x
            else:
                assert 2 * j + ((y + 1) % 2) == x


def test_init_bits_matches_naive():
    seed = 424242
    b, w = lattice.init_bits(seed, 6, 16)
    full = np.asarray(lattice.compact_to_full(b, w))
    expect = naive_init(seed, 6, 16)
    np.testing.assert_array_equal(full, expect)


def test_init_bits_sharded_slice():
    seed = 11
    b, w = lattice.init_bits(seed, 8, 32)
    b2, w2 = lattice.init_bits(seed, 8, 32, row0=4, local_rows=4)
    np.testing.assert_array_equal(np.asarray(b)[4:8], np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(w)[4:8], np.asarray(w2))


def test_init_balance():
    b, w = lattice.init_bits(5, 256, 256)
    frac = (np.asarray(b).mean() + np.asarray(w).mean()) / 2
    assert abs(frac - 0.5) < 0.01


def test_bits_to_spins():
    bits = jnp.asarray([[0, 1], [1, 0]], jnp.uint8)
    s = np.asarray(lattice.bits_to_spins(bits))
    np.testing.assert_array_equal(s, [[-1, 1], [1, -1]])


def test_init_store_chunked_matches_one_shot():
    """Row-chunked storage init is bit-identical to the one-shot path."""
    from ising_tpu import SimConfig, get_backend
    seed = 77
    for backend in ("xla", "packed", "bit1"):
        cfg = SimConfig(nrows=32, ncols=64, temp=1.5, backend=backend)
        be = get_backend(cfg)
        one = be.encode(*lattice.init_bits(seed, 32, 64))
        chunked = lattice.init_store(seed, 32, 64, be.encode, chunk_rows=8)
        np.testing.assert_array_equal(np.asarray(one[0]),
                                      np.asarray(chunked[0]), backend)
        np.testing.assert_array_equal(np.asarray(one[1]),
                                      np.asarray(chunked[1]), backend)
    # non-dividing chunk_rows falls back to an even divisor
    cfg = SimConfig(nrows=24, ncols=64, temp=1.5, backend="xla")
    be = get_backend(cfg)
    one = be.encode(*lattice.init_bits(seed, 24, 64))
    chunked = lattice.init_store(seed, 24, 64, be.encode, chunk_rows=10)
    np.testing.assert_array_equal(np.asarray(one[0]), np.asarray(chunked[0]))
