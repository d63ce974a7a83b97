"""Randomized cross-backend property test.

Draws random (geometry, temperature, seed, feature) combinations and
requires the packed backend to reproduce the xla backend bit-for-bit.
Seeded, so failures are reproducible.
"""

import numpy as np
import pytest

from ising_tpu import SimConfig
from ising_tpu.driver import Simulation


def random_cases(n, master_seed=20260816):
    rs = np.random.RandomState(master_seed)
    cases = []
    for _ in range(n):
        nrows = 2 * int(rs.randint(2, 20))
        ncols = 16 * int(rs.randint(1, 12))
        temp = float(rs.choice([0.0, 0.8, 1.5, 2.269, 3.5, 8.0]))
        seed = int(rs.randint(1, 2 ** 50))
        kw = dict(nrows=nrows, ncols=ncols, temp=temp, seed=seed)
        feature = rs.randint(0, 4)
        if feature == 1:
            kw["j_prob"] = float(rs.uniform(0, 1))
        elif feature == 3:
            # external field (full-table accept), optionally on disorder
            kw["field"] = float(rs.uniform(-3.0, 3.0)) or 0.5
            if rs.randint(0, 2):
                kw["j_prob"] = float(rs.uniform(0, 1))
        elif feature == 2:
            # replica mode obeying the packed divisibility rules
            w = ncols // 16
            csls = [c for c in range(1, w + 1)
                    if w % c == 0 and ncols % (2 * c) == 0]
            ysls = [y for y in range(8, nrows + 1, 8) if nrows % y == 0]
            if csls and ysls:
                kw["xsl"] = 2 * int(rs.choice(csls))
                kw["ysl"] = int(rs.choice(ysls))
        cases.append(kw)
    return cases


@pytest.mark.parametrize("kw", random_cases(12))
def test_packed_matches_xla_random(kw):
    rngs = ["philox", "threefry", "philox7", "threefry13"]
    rng = rngs[kw["seed"] % 4]
    s_x = Simulation(SimConfig(backend="xla", rng=rng, **kw))
    s_p = Simulation(SimConfig(backend="packed", rng=rng, **kw))
    s_x.advance(3)
    s_p.advance(3)
    bx, wx = s_x.bits()
    bp, wp = s_p.bits()
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bp),
                                  err_msg=f"case {kw} rng={rng}")
    np.testing.assert_array_equal(np.asarray(wx), np.asarray(wp),
                                  err_msg=f"case {kw} rng={rng}")


def bit1_cases(n, master_seed=20260817):
    """Random geometries legal for bit1 (ncols % 64; ~1/3 with disorder,
    ~1/4 with an external field — field cases must ride plane rng modes,
    which the rng selectors below honor)."""
    rs = np.random.RandomState(master_seed)
    out = []
    for _ in range(n):
        kw = dict(nrows=2 * int(rs.randint(2, 20)),
                  ncols=64 * int(rs.randint(1, 5)),
                  temp=float(rs.choice([0.0, 0.8, 1.5, 2.269, 3.5, 8.0])),
                  seed=int(rs.randint(1, 2 ** 50)))
        if rs.randint(0, 3) == 0:
            kw["j_prob"] = float(rs.uniform(0, 1))
        if rs.randint(0, 4) == 0:
            kw["field"] = float(rs.uniform(-3.0, 3.0)) or 0.5
        out.append(kw)
    return out


BIT1_PLANE_RNGS = ["philox7b", "threefry13b", "chacha8b"]


@pytest.mark.parametrize("kw", bit1_cases(8))
def test_bit1_matches_xla_random(kw):
    """Random sweep over the bit1 tier incl. the bit-plane rng modes."""
    rngs = ["philox", "threefry13", "philox7b", "threefry13b", "chacha8b"]
    rng = rngs[kw["seed"] % 5]
    if "field" in kw:
        # bit1 field runs use the 10-class bit-serial accept: plane modes.
        rng = BIT1_PLANE_RNGS[kw["seed"] % 3]
    s_x = Simulation(SimConfig(backend="xla", rng=rng, **kw))
    s_b = Simulation(SimConfig(backend="bit1", rng=rng, **kw))
    s_x.advance(3)
    s_b.advance(3)
    bx, wx = s_x.bits()
    bb, wb = s_b.bits()
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bb),
                                  err_msg=f"case {kw} rng={rng}")
    np.testing.assert_array_equal(np.asarray(wx), np.asarray(wb),
                                  err_msg=f"case {kw} rng={rng}")
