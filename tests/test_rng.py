"""Philox4x32-10 correctness: known-answer vectors, layout, statistics."""

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import rng
from naive_reference import philox4x32_ref


# Known-answer vectors from the Random123 distribution (kat_vectors,
# philox4x32-10).
KAT = [
    ((0, 0, 0, 0), (0, 0),
     (0x6627E8D5, 0xE169C58D, 0xBC57AC4C, 0x9B00DBD8)),
    ((0xFFFFFFFF,) * 4, (0xFFFFFFFF,) * 2,
     (0x408F276D, 0x41C83B0E, 0xA20BC7C6, 0x6D5451FD)),
    ((0x243F6A88, 0x85A308D3, 0x13198A2E, 0x03707344),
     (0xA4093822, 0x299F31D0),
     (0xD16CFE09, 0x94FDCCEB, 0x5001E420, 0x24126EA1)),
]


def test_philox_kat_jax():
    for ctr, key, expect in KAT:
        out = rng.philox4x32(*ctr, *key)
        got = tuple(int(o) for o in out)
        assert got == expect, f"ctr={ctr} key={key}: {got} != {expect}"


def test_philox_kat_naive():
    # The scalar test-side implementation must agree with the vectors too.
    for ctr, key, expect in KAT:
        assert philox4x32_ref(ctr, key) == expect


def test_philox_vectorized_matches_scalar():
    c0 = jnp.arange(64, dtype=jnp.uint32)
    outs = rng.philox4x32(c0, 7, 9, 11, 123, 456)
    for i in range(64):
        ref = philox4x32_ref((i, 7, 9, 11), (123, 456))
        got = tuple(int(o[i]) for o in outs)
        assert got == ref


def test_mulhilo32_exhaustive_sample():
    rs = np.random.RandomState(0)
    a = rs.randint(0, 2 ** 32, size=1000, dtype=np.uint64)
    b = rs.randint(0, 2 ** 32, size=1000, dtype=np.uint64)
    hi, lo = rng.mulhilo32(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    prod = (a.astype(object) * b.astype(object))
    np.testing.assert_array_equal(np.asarray(hi, np.uint64),
                                  np.array([p >> 32 for p in prod], np.uint64))
    np.testing.assert_array_equal(np.asarray(lo, np.uint64),
                                  np.array([p & 0xFFFFFFFF for p in prod], np.uint64))


def test_color_draws_layout():
    """Draw for site (y, x) must equal output[x % 4] of the quad counter."""
    seed = 463463564571
    d = np.asarray(rng.color_draws(seed, 6, 16, step=3, tag=1))
    from naive_reference import site_draw
    for y in range(6):
        for x in range(16):
            assert int(d[y, x]) == site_draw(seed, y, x, 16, 3, 1)


def test_color_draws_sharding_invariance():
    """A row-shard's draws must be a slice of the full-lattice draws."""
    seed = 99
    full = np.asarray(rng.color_draws(seed, 8, 32, step=5, tag=0))
    shard = np.asarray(rng.color_draws(seed, 4, 32, step=5, tag=0,
                                       row0=4, row_stride=32))
    np.testing.assert_array_equal(shard, full[4:8])


def test_draw_uniformity():
    d = np.asarray(rng.color_draws(1234, 256, 256, step=0, tag=0))
    u = d / 2.0 ** 32
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1.0 / 12.0) < 0.001
    # bit balance
    bits = np.unpackbits(d.view(np.uint8))
    assert abs(bits.mean() - 0.5) < 0.002


def test_streams_distinct():
    a = np.asarray(rng.color_draws(1, 16, 16, step=0, tag=0))
    b = np.asarray(rng.color_draws(1, 16, 16, step=0, tag=1))
    c = np.asarray(rng.color_draws(1, 16, 16, step=1, tag=0))
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # different seeds differ
    d = np.asarray(rng.color_draws(2, 16, 16, step=0, tag=0))
    assert not np.array_equal(a, d)


def test_threefry_matches_jax():
    """Our Threefry2x32-20 must match jax's own implementation bit-for-bit."""
    from jax._src import prng as jprng
    c0 = jnp.arange(16, dtype=jnp.uint32)
    c1 = jnp.arange(16, dtype=jnp.uint32) * 7 + 3
    o0, o1 = rng.threefry2x32(c0, c1, 111, 222)
    ref = jprng.threefry_2x32(jnp.asarray([111, 222], jnp.uint32),
                              jnp.concatenate([c0, c1]))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(ref[:16]))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(ref[16:]))


def test_threefry_draws_sharding_invariance():
    full = np.asarray(rng.threefry_color_draws(99, 8, 32, step=5, tag=0))
    shard = np.asarray(rng.threefry_color_draws(99, 4, 32, step=5, tag=0,
                                                row0=4, row_stride=32))
    np.testing.assert_array_equal(shard, full[4:8])


def test_threefry_stream_separation():
    a = np.asarray(rng.threefry_color_draws(1, 8, 16, step=0, tag=0))
    b = np.asarray(rng.threefry_color_draws(1, 8, 16, step=0, tag=1))
    c = np.asarray(rng.threefry_color_draws(1, 8, 16, step=1, tag=0))
    assert not np.array_equal(a, b) and not np.array_equal(a, c)
    u = a / 2.0 ** 32
    assert abs(u.mean() - 0.5) < 0.05


# ---------------------------------------------------------------------------
# Reduced-round counter modes (philox7 / threefry13, the BigCrush-validated
# minima of the Random123 paper). KAT discipline: the library's vector
# implementation must match the independent scalar implementation in
# naive_reference.py at every supported round count.

def test_threefry_rounds_match_scalar():
    from naive_reference import threefry2x32_ref
    c0 = jnp.arange(16, dtype=jnp.uint32) * 13 + 5
    c1 = jnp.arange(16, dtype=jnp.uint32) * 3 + 1
    for rounds in (13, 20):
        o0, o1 = rng.threefry2x32(c0, c1, 111, 222, rounds)
        for i in range(16):
            ref = threefry2x32_ref(int(c0[i]), int(c1[i]), 111, 222, rounds)
            assert (int(o0[i]), int(o1[i])) == ref, (rounds, i)


def test_philox_rounds_match_scalar():
    c0 = jnp.arange(16, dtype=jnp.uint32) * 7 + 2
    for rounds in (7, 10):
        outs = rng.philox4x32(c0, 3, 5, 9, 42, 77, rounds)
        for i in range(16):
            ref = philox4x32_ref((int(c0[i]), 3, 5, 9), (42, 77), rounds)
            assert tuple(int(o[i]) for o in outs) == ref, (rounds, i)


def test_reduced_rounds_are_distinct_streams():
    a = np.asarray(rng.counter_color_draws("threefry", 1, 8, 16, step=0, tag=0))
    b = np.asarray(rng.counter_color_draws("threefry13", 1, 8, 16, step=0, tag=0))
    c = np.asarray(rng.counter_color_draws("philox", 1, 8, 16, step=0, tag=0))
    d = np.asarray(rng.counter_color_draws("philox7", 1, 8, 16, step=0, tag=0))
    assert not np.array_equal(a, b)
    assert not np.array_equal(c, d)


def test_counter_color_draws_dispatch():
    full = np.asarray(rng.color_draws(9, 8, 16, step=2, tag=1, rounds=7))
    got = np.asarray(rng.counter_color_draws("philox7", 9, 8, 16, step=2, tag=1))
    np.testing.assert_array_equal(full, got)
    full = np.asarray(rng.threefry_color_draws(9, 8, 16, step=2, tag=1,
                                               rounds=13))
    got = np.asarray(rng.counter_color_draws("threefry13", 9, 8, 16,
                                             step=2, tag=1))
    np.testing.assert_array_equal(full, got)


def test_reduced_round_uniformity():
    """philox7/threefry13 draws must still look uniform (coarse check; the
    real statistical guarantee is the Random123 BigCrush validation)."""
    for mode in ("philox7", "threefry13"):
        d = np.asarray(rng.counter_color_draws(mode, 1234, 256, 256,
                                               step=0, tag=0))
        u = d / 2.0 ** 32
        assert abs(u.mean() - 0.5) < 0.005, mode
        assert abs(u.var() - 1.0 / 12.0) < 0.001, mode
        bits = np.unpackbits(d.view(np.uint8))
        assert abs(bits.mean() - 0.5) < 0.002, mode


def test_reduced_round_sharding_invariance():
    for mode in ("philox7", "threefry13"):
        full = np.asarray(rng.counter_color_draws(mode, 99, 8, 32,
                                                  step=5, tag=0))
        shard = np.asarray(rng.counter_color_draws(mode, 99, 4, 32, step=5,
                                                   tag=0, row0=4,
                                                   row_stride=32))
        np.testing.assert_array_equal(shard, full[4:8], err_msg=mode)


# ---------------------------------------------------------------------------
# ChaCha8 (the chacha8b plane mode's generator): same KAT discipline — the
# vector implementation must match the independent scalar one (matrix/loop
# form in naive_reference.py) at several round counts, and the draw layout
# must obey the documented 16-slot contract.

def test_chacha_matches_scalar():
    from naive_reference import chacha_ref
    c0 = jnp.arange(16, dtype=jnp.uint32) * 11 + 4
    c1 = jnp.arange(16, dtype=jnp.uint32) * 5 + 9
    for rounds in (4, 6, 8, 12, 20):
        outs = rng.chacha_block(c0, c1, 7, 3, 0xDEADBEEF, 0x12345678, rounds)
        assert len(outs) == 16
        for i in range(16):
            ref = chacha_ref(int(c0[i]), int(c1[i]), 7, 3,
                             0xDEADBEEF, 0x12345678, rounds)
            assert [int(o[i]) for o in outs] == ref, (rounds, i)


def test_chacha_draws_layout():
    """Draw for (y, col) must equal output[col // g] of counter y*g + col%g."""
    from naive_reference import site_draw
    seed = 463463564571
    d = np.asarray(rng.chacha_color_draws(seed, 4, 32, step=3, tag=1))
    for y in range(4):
        for x in range(32):
            assert int(d[y, x]) == site_draw(seed, y, x, 32, 3, 1,
                                             mode="chacha8")


def test_chacha_draws_sharding_invariance():
    full = np.asarray(rng.chacha_color_draws(99, 8, 32, step=5, tag=0))
    shard = np.asarray(rng.chacha_color_draws(99, 4, 32, step=5, tag=0,
                                              row0=4, row_stride=32))
    np.testing.assert_array_equal(shard, full[4:8])
    got = np.asarray(rng.counter_color_draws("chacha8b", 99, 8, 32,
                                             step=5, tag=0))
    np.testing.assert_array_equal(got, full)


def test_chacha_stream_separation_and_uniformity():
    a = np.asarray(rng.chacha_color_draws(1, 8, 16, step=0, tag=0))
    b = np.asarray(rng.chacha_color_draws(1, 8, 16, step=0, tag=1))
    c = np.asarray(rng.chacha_color_draws(1, 8, 16, step=1, tag=0))
    d = np.asarray(rng.chacha_color_draws(2, 8, 16, step=0, tag=0))
    assert not np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert not np.array_equal(a, d)
    big = np.asarray(rng.chacha_color_draws(1234, 256, 256, step=0, tag=0))
    u = big / 2.0 ** 32
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1.0 / 12.0) < 0.001
    bits = np.unpackbits(big.view(np.uint8))
    assert abs(bits.mean() - 0.5) < 0.002


def test_chacha_odd_rounds_rejected():
    # The block function applies column/diagonal PAIRS; an odd count would
    # silently floor and diverge from the scalar reference's single-round
    # application.
    c = jnp.zeros(4, dtype=jnp.uint32)
    with pytest.raises(ValueError, match="even"):
        rng.chacha_block(c, c, 0, 0, 1, 2, 7)


def test_chacha_width_validated_upfront():
    from ising_tpu.config import SimConfig
    with pytest.raises(ValueError, match="multiple of 32"):
        SimConfig(nrows=8, ncols=40, temp=1.5, backend="xla", rng="chacha8")
    # ncols % 32 == 0 constructs fine.
    SimConfig(nrows=8, ncols=64, temp=1.5, backend="xla", rng="chacha8")


def test_hw_draws_distinct_per_row_offset():
    # Sharded runs pass each slab's global row0; the hw stream must differ
    # per slab (the xla analog of the Pallas hw seeding's row-block term) —
    # identical streams would correlate every slab's accept decisions.
    a = np.asarray(rng.counter_color_draws("hw", 123, 8, 32, step=0, tag=0,
                                           row0=0))
    b = np.asarray(rng.counter_color_draws("hw", 123, 8, 32, step=0, tag=0,
                                           row0=8))
    assert not np.array_equal(a, b)
