"""Compact-domain (scale-safe) observables vs the full-lattice formulation.

The library computes energy / correlation / replica magnetization without
ever materializing the full (Y, X) int32 spin lattice (which would be ~17 GB
at the reference's 65536^2-per-chip scale). These tests pin the compact XOR
formulation bit-for-bit to the straightforward full-lattice math.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import observables
from ising_tpu.lattice import bits_to_spins, compact_to_full, full_to_compact


def full_energy_rows(black, white, v=None, h=None):
    s = bits_to_spins(compact_to_full(black, white)).astype(jnp.int32)
    hb = s * jnp.roll(s, -1, axis=1)
    vb = s * jnp.roll(s, -1, axis=0)
    if h is not None:
        hb = hb * (1 - 2 * h.astype(jnp.int32))
    if v is not None:
        vb = vb * (1 - 2 * v.astype(jnp.int32))
    return jnp.sum(hb + vb, axis=1)


def full_corr_rows(black, white, corr_len, xsl=None, ysl=None):
    s = bits_to_spins(compact_to_full(black, white)).astype(jnp.int32)
    Y, X = s.shape
    out = []
    for d in range(1, corr_len + 1):
        if xsl is not None:
            t = s.reshape(Y // ysl, ysl, X // xsl, xsl)
            hcorr = jnp.sum(t * jnp.roll(t, -d, axis=3), axis=(2, 3))
            vcorr = jnp.sum(t * jnp.roll(t, -d, axis=1), axis=(2, 3))
            out.append((hcorr + vcorr).reshape(Y))
        else:
            hcorr = jnp.sum(s * jnp.roll(s, -d, axis=1), axis=1)
            vcorr = jnp.sum(s * jnp.roll(s, -d, axis=0), axis=1)
            out.append(hcorr + vcorr)
    return jnp.stack(out)


def random_planes(Y, X, seed):
    rs = np.random.RandomState(seed)
    full = rs.randint(0, 2, size=(Y, X)).astype(np.uint8)
    return full_to_compact(jnp.asarray(full))


@pytest.mark.parametrize("shape,seed", [((8, 16), 0), ((6, 24), 1),
                                        ((16, 32), 2)])
def test_energy_rows_match_full(shape, seed):
    b, w = random_planes(*shape, seed)
    np.testing.assert_array_equal(
        np.asarray(observables.energy_row_sums(b, w)),
        np.asarray(full_energy_rows(b, w)))


def test_energy_rows_match_full_disorder():
    Y, X = 8, 16
    b, w = random_planes(Y, X, 3)
    rs = np.random.RandomState(7)
    v = jnp.asarray(rs.randint(0, 2, size=(Y, X)).astype(np.uint8))
    h = jnp.asarray(rs.randint(0, 2, size=(Y, X)).astype(np.uint8))
    np.testing.assert_array_equal(
        np.asarray(observables.energy_row_sums(b, w, v, h)),
        np.asarray(full_energy_rows(b, w, v, h)))


@pytest.mark.parametrize("shape,seed", [((8, 16), 0), ((12, 40), 4)])
def test_corr_rows_match_full(shape, seed):
    Y, X = shape
    b, w = random_planes(Y, X, seed)
    corr_len = min(Y, X) // 2
    np.testing.assert_array_equal(
        np.asarray(observables.correlation_row_sums(b, w, corr_len)),
        np.asarray(full_corr_rows(b, w, corr_len)))


def test_corr_rows_match_full_replica():
    Y, X = 16, 32
    b, w = random_planes(Y, X, 5)
    for xsl, ysl in [(8, 4), (16, 8), (32, 16)]:
        np.testing.assert_array_equal(
            np.asarray(observables.correlation_row_sums(
                b, w, 3, xsl=xsl, ysl=ysl)),
            np.asarray(full_corr_rows(b, w, 3, xsl=xsl, ysl=ysl)),
            err_msg=f"replica {xsl}x{ysl}")


def test_replica_magnetizations_match_full():
    Y, X = 16, 32
    b, w = random_planes(Y, X, 6)
    xsl, ysl = 8, 4
    s = np.asarray(bits_to_spins(compact_to_full(b, w)), np.int64)
    t = s.reshape(Y // ysl, ysl, X // xsl, xsl)
    expect = np.abs(t.sum(axis=(1, 3))) / (xsl * ysl)
    got = observables.replica_magnetizations(b, w, xsl, ysl)
    np.testing.assert_allclose(got, expect.reshape(-1))


def test_no_full_int32_materialization():
    """The jaxpr of the compact energy/corr paths must contain no (Y, X)
    int32-or-wider intermediate (the scale-safety property itself)."""
    import jax
    Y, X = 32, 64
    b = jnp.zeros((Y, X // 2), jnp.uint8)
    w = jnp.zeros((Y, X // 2), jnp.uint8)

    def assert_no_wide_full(jaxpr):
        for eqn in jaxpr.eqns:
            for var in eqn.outvars:
                shape = getattr(var.aval, "shape", ())
                dtype = getattr(var.aval, "dtype", None)
                if shape == (Y, X) and dtype is not None and \
                        np.dtype(dtype).itemsize >= 4:
                    raise AssertionError(
                        f"full-lattice {dtype} intermediate: {eqn}")

    assert_no_wide_full(
        jax.make_jaxpr(lambda: observables.energy_row_sums(b, w))().jaxpr)
    assert_no_wide_full(
        jax.make_jaxpr(lambda: observables.correlation_row_sums(b, w, 4))()
        .jaxpr)


def test_correlation_row_chunking_exact():
    """Row-chunked correlation == single-chunk, full and replica modes."""
    import jax.numpy as jnp
    rs = np.random.RandomState(9)
    full = rs.randint(0, 2, (16, 32)).astype(np.uint8)
    from ising_tpu import lattice
    b, w = lattice.full_to_compact(jnp.asarray(full))
    one = observables.correlation_row_sums(b, w, 5)
    for chunk in (2, 4, 6, 8):
        got = observables.correlation_row_sums(b, w, 5, row_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(one), np.asarray(got), chunk)
    onr = observables.correlation_row_sums(b, w, 3, xsl=8, ysl=4)
    for chunk in (4, 8, 12):
        got = observables.correlation_row_sums(b, w, 3, xsl=8, ysl=4,
                                               row_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(onr), np.asarray(got), chunk)


def test_energy_row_chunking_exact():
    import jax.numpy as jnp
    from ising_tpu import lattice
    rs = np.random.RandomState(10)
    full = rs.randint(0, 2, (16, 32)).astype(np.uint8)
    v = rs.randint(0, 2, (16, 32)).astype(np.uint8)
    h = rs.randint(0, 2, (16, 32)).astype(np.uint8)
    b, w = lattice.full_to_compact(jnp.asarray(full))
    one = observables.energy_row_sums(b, w, jnp.asarray(v), jnp.asarray(h))
    for chunk in (2, 4, 8):
        got = observables.energy_row_sums(b, w, jnp.asarray(v),
                                          jnp.asarray(h), row_chunk=chunk)
        np.testing.assert_array_equal(np.asarray(one), np.asarray(got), chunk)


def test_bit1_word_observables_match_decoded():
    """Word-domain energy/correlation on bit1 storage == decoded-plane path.

    ncols=64 gives W1=1 (every column shift is a pure bit rotation) and
    ncols=256 gives W1=4 (lane rolls + boundary selects + rotations for
    d > W1) — both compared bit-for-bit, incl. row chunking."""
    import jax.numpy as jnp
    from ising_tpu import SimConfig, get_backend, lattice
    for ncols in (64, 256):
        cfg = SimConfig(nrows=16, ncols=ncols, temp=1.5, backend="bit1")
        be = get_backend(cfg)
        b8, w8 = lattice.init_bits(123, 16, ncols)
        bs, ws = be.encode(b8, w8)
        want_e = observables.energy_row_sums(b8, w8)
        got_e = observables.bit1_energy_row_sums(bs, ws)
        np.testing.assert_array_equal(np.asarray(want_e), np.asarray(got_e))
        got_e2 = observables.bit1_energy_row_sums(bs, ws, row_chunk=4)
        np.testing.assert_array_equal(np.asarray(want_e), np.asarray(got_e2))
        corr_len = 9  # crosses d > W1 and odd/even splits
        want_c = observables.correlation_row_sums(b8, w8, corr_len)
        got_c = observables.bit1_correlation_row_sums(bs, ws, corr_len)
        np.testing.assert_array_equal(np.asarray(want_c), np.asarray(got_c))
        got_c2 = observables.bit1_correlation_row_sums(bs, ws, corr_len,
                                                       row_chunk=4)
        np.testing.assert_array_equal(np.asarray(want_c), np.asarray(got_c2))


def test_driver_energy_and_corr_word_path(tmp_path):
    """Simulation.energy() and corr files agree between bit1 (word path)
    and xla (decoded path) in a bit-reproducible rng mode."""
    import os
    from ising_tpu import SimConfig
    from ising_tpu.driver import Simulation
    base = dict(nrows=16, ncols=64, temp=1.6, seed=77, rng="philox7b",
                niters=2)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        sims = {}
        for bk in ("xla", "bit1"):
            s = Simulation(SimConfig(backend=bk, **base))
            s.advance(2)
            sims[bk] = s
        assert sims["xla"].energy() == pytest.approx(sims["bit1"].energy())
        for bk in ("xla", "bit1"):
            sims[bk]._append_corr(2)
        files = sorted(os.listdir("."))
        assert len(files) == 1  # same path -> both appended to one file
        lines = open(files[0]).read().strip().splitlines()
        assert len(lines) == 2
        assert lines[0].split() == lines[1].split()  # identical values
    finally:
        os.chdir(cwd)

def test_bit1_energy_rows_disordered_match_full():
    """Word-domain disordered energy (parity-split packed links) is
    bit-exact vs the full-lattice int32 formulation."""
    from ising_tpu.ops.pallas_bit1 import pack_bits1
    rs = np.random.RandomState(7)
    Y, X = 16, 128
    b, w = random_planes(Y, X, 7)
    v = jnp.asarray(rs.randint(0, 2, size=(Y, X)).astype(np.uint8))
    h = jnp.asarray(rs.randint(0, 2, size=(Y, X)).astype(np.uint8))
    links_words = (pack_bits1(v[:, 0::2]), pack_bits1(v[:, 1::2]),
                   pack_bits1(h[:, 0::2]), pack_bits1(h[:, 1::2]))
    got = observables.bit1_energy_row_sums(
        pack_bits1(b), pack_bits1(w), links_words=links_words)
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(full_energy_rows(b, w, v, h)))
    # multi-chunk streaming path
    got2 = observables.bit1_energy_row_sums(
        pack_bits1(b), pack_bits1(w), links_words=links_words, row_chunk=4)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(got))
