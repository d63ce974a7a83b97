"""Native C++ codec: build, round trips, Philox cross-validation."""

import numpy as np
import jax.numpy as jnp
import pytest

native = pytest.importorskip("ising_tpu.native.codec",
                             reason="g++ unavailable")

from ising_tpu import rng  # noqa: E402
from naive_reference import philox4x32_ref  # noqa: E402


def test_native_philox_kat():
    assert native.philox4x32((0, 0, 0, 0), (0, 0)) == \
        (0x6627E8D5, 0xE169C58D, 0xBC57AC4C, 0x9B00DBD8)
    assert native.philox4x32((0xFFFFFFFF,) * 4, (0xFFFFFFFF,) * 2) == \
        (0x408F276D, 0x41C83B0E, 0xA20BC7C6, 0x6D5451FD)


def test_native_philox_matches_python_and_jax():
    for ctr, key in [((1, 2, 3, 4), (5, 6)), ((7, 0, 9, 0), (0, 1))]:
        cpp = native.philox4x32(ctr, key)
        py = philox4x32_ref(ctr, key)
        jx = tuple(int(v) for v in rng.philox4x32(*ctr, *key))
        assert cpp == py == jx


def test_native_plane_matches_color_draws():
    seed, step, tag = 463463564571, 7, 1
    jx = np.asarray(rng.color_draws(seed, 8, 32, step=step, tag=tag))
    cpp = native.philox_plane(seed, step, tag, 0, 8, 32)
    np.testing.assert_array_equal(jx, cpp)
    # sharded slice
    cpp_slice = native.philox_plane(seed, step, tag, 4, 4, 32)
    np.testing.assert_array_equal(jx[4:], cpp_slice)


@pytest.mark.parametrize("rounds", [2, 4, 6, 8])
def test_native_chacha_matches_python_and_jax(rounds):
    """The C++ scalar twin (which generates the battery's qualification
    streams, native/rngtest.cpp) matches both the independent Python
    scalar and the JAX vector implementation for every reduced-round
    variant the battery qualifies."""
    from naive_reference import chacha_ref
    for ctr, key in [((0, 0), (0, 0)), ((1, 2), (5, 6)),
                     ((0xFFFFFFFF, 0xFFFFFFFF), (0xDEADBEEF, 0x12345678))]:
        cpp = native.chacha_block(ctr[0], ctr[1], 7, 3, key, rounds)
        py = tuple(chacha_ref(ctr[0], ctr[1], 7, 3, key[0], key[1], rounds))
        jx = tuple(int(v) for v in rng.chacha_block(
            ctr[0], ctr[1], 7, 3, key[0], key[1], rounds))
        assert cpp == py == jx, (ctr, key, rounds)


@pytest.mark.parametrize("rounds", [4, 6, 8])
def test_native_chacha_plane_matches_color_draws(rounds):
    """The bulk plane generator feeds the battery the EXACT stream the
    library consumes: cross-check against chacha_color_draws, full plane
    and sharded row slice."""
    seed, step, tag = 463463564571, 7, 1
    jx = np.asarray(rng.chacha_color_draws(seed, 8, 64, step=step, tag=tag,
                                           rounds=rounds))
    cpp = native.chacha_plane(seed, step, tag, 0, 8, 64, rounds)
    np.testing.assert_array_equal(jx, cpp)
    cpp_slice = native.chacha_plane(seed, step, tag, 4, 4, 64, rounds)
    np.testing.assert_array_equal(jx[4:], cpp_slice)


def test_native_hex_round_trip(tmp_path):
    rs = np.random.RandomState(1)
    bits = rs.randint(0, 2, size=(16, 64)).astype(np.uint8)
    p = str(tmp_path / "lat.txt")
    native.write_hex(p, bits)
    back = native.read_hex(p)
    np.testing.assert_array_equal(bits, back)


def test_native_matches_python_io(tmp_path):
    """Native writer output must be byte-identical to the NumPy fallback."""
    from ising_tpu import io as lio
    from ising_tpu.lattice import full_to_compact
    rs = np.random.RandomState(2)
    full = rs.randint(0, 2, size=(8, 16)).astype(np.uint8)
    b, w = full_to_compact(jnp.asarray(full))

    p1 = str(tmp_path / "native.txt")
    lio.dump_lattice(p1, b, w, fmt="hex")  # uses native codec when present

    # Force the fallback path
    import ising_tpu.io
    orig = ising_tpu.io._native_codec
    ising_tpu.io._native_codec = lambda: None
    try:
        p2 = str(tmp_path / "fallback.txt")
        lio.dump_lattice(p2, b, w, fmt="hex")
    finally:
        ising_tpu.io._native_codec = orig
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_native_read_rejects_garbage(tmp_path):
    p = tmp_path / "bad.txt"
    p.write_text("01x0\n0101\n")
    with pytest.raises(OSError):
        native.read_hex(str(p))
