"""Statistical correctness of the full accept pipeline.

Beyond bit-parity: verify that realized flip frequencies match the exact
Metropolis acceptance probabilities class by class — this catches subtle
contract bugs (wrong threshold scaling, biased draws, class mix-ups) that
trajectory-parity tests cannot, because all backends would share them.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, get_backend, lattice
from ising_tpu.constants import BLACK, WHITE
from ising_tpu.models import ising


def measure_flip_rates(cfg, nsteps=40):
    """Observed flip frequency per (own bit, neighbor count) class."""
    be = get_backend(cfg)
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    flips = np.zeros((2, 5))
    counts = np.zeros((2, 5))
    bs, ws = be.encode(b, w)
    for step in range(nsteps):
        # classify every black site before the update
        bb, wb = be.decode(bs, ws)
        full = np.asarray(lattice.compact_to_full(bb, wb)).astype(np.int64)
        Y, X = full.shape
        nn = (np.roll(full, 1, 0) + np.roll(full, -1, 0)
              + np.roll(full, 1, 1) + np.roll(full, -1, 1))
        color = (np.indices(full.shape).sum(axis=0) + 1) % 2  # 1 where black
        new_bs = be.update_color(bs, ws, color=BLACK, thr10=thr,
                                 step=jnp.uint32(step),
                                 src_up=ws[-1:], src_dn=ws[:1])
        nb, _ = be.decode(new_bs, ws)
        new_full = np.asarray(lattice.compact_to_full(nb, wb))
        flipped = (new_full != full) & (color == 1)
        for bbit in range(2):
            for n in range(5):
                m = (color == 1) & (full == bbit) & (nn == n)
                counts[bbit, n] += m.sum()
                flips[bbit, n] += (m & flipped).sum()
        bs = new_bs
        ws = be.update_color(ws, bs, color=WHITE, thr10=thr,
                             step=jnp.uint32(step),
                             src_up=bs[-1:], src_dn=bs[:1])
    return flips, counts


@pytest.mark.parametrize("backend,rng", [
    ("xla", None), ("packed", None), ("bit1", None),
    # bit1 + hw exercises the bit-serial Bernoulli-plane accept path
    # (static k-bit thresholds); in interpret mode its planes come from the
    # philox fallback, so the decision logic is fully covered on CPU.
    ("bit1", "hw"),
    # bit-plane counter contract (k = 16): realized rates must still match
    # the exact probabilities (quantization bias 2^-17 << binomial noise).
    ("bit1", "threefry13b"),
    ("xla", "philox7b"),
    ("bit1", "chacha8b"),
])
def test_acceptance_rates_match_exact(backend, rng):
    T = 2.0
    kw = {} if rng is None else {"rng": rng}
    cfg = SimConfig(nrows=64, ncols=64, temp=T, seed=77, backend=backend,
                    **kw)
    flips, counts = measure_flip_rates(cfg)
    p = ising.acceptance_probabilities(T)
    for b in range(2):
        for n in range(5):
            if counts[b, n] < 400:
                continue
            expect = min(1.0, p[b, n])
            got = flips[b, n] / counts[b, n]
            # binomial 4-sigma band
            sigma = math.sqrt(expect * (1 - expect) / counts[b, n]) + 1e-9
            assert abs(got - expect) < 4 * sigma + 0.01, \
                f"class (b={b}, n={n}): got {got:.4f}, expect {expect:.4f}"


def test_correlation_replica_matches_naive():
    """Replica-mode correlation against a direct loop computation."""
    from ising_tpu import observables
    rs = np.random.RandomState(5)
    Y, X, ysl, xsl = 8, 16, 4, 8
    full = rs.randint(0, 2, (Y, X)).astype(np.uint8)
    s = 2 * full.astype(np.int64) - 1
    b, w = lattice.full_to_compact(jnp.asarray(full))
    got = observables.correlation(b, w, corr_len=3, xsl=xsl, ysl=ysl)
    for d in range(1, 4):
        tot = 0
        for y in range(Y):
            for x in range(X):
                y0, x0 = (y // ysl) * ysl, (x // xsl) * xsl
                xr = x0 + (x - x0 + d) % xsl
                yd = y0 + (y - y0 + d) % ysl
                tot += s[y, x] * s[y, xr] + s[y, x] * s[yd, x]
        assert got[d - 1] == pytest.approx(tot / (2.0 * Y * X)), f"d={d}"


def test_correlation_full_matches_naive():
    from ising_tpu import observables
    rs = np.random.RandomState(6)
    Y, X = 8, 16
    full = rs.randint(0, 2, (Y, X)).astype(np.uint8)
    s = 2 * full.astype(np.int64) - 1
    b, w = lattice.full_to_compact(jnp.asarray(full))
    got = observables.correlation(b, w, corr_len=3)
    for d in range(1, 4):
        tot = (s * np.roll(s, -d, 1)).sum() + (s * np.roll(s, -d, 0)).sum()
        assert got[d - 1] == pytest.approx(tot / (2.0 * Y * X))
