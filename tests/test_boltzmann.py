"""Exact-Boltzmann validation: the sharpest equilibrium test possible.

A 2x8 lattice has 2^16 states — small enough to enumerate the exact
partition function (with the library's own bond convention: every site
counts its right and down neighbor once, so Y=2 has doubled vertical
bonds) yet large enough to exercise the real kernels. Long device-side
sampling runs (one lax.scan, no host round trips) must reproduce the
exact <E>, <M> and <M^2> within autocorrelation-aware error bars, WITH a
field — this validates detailed balance of the full-table Metropolis
accept and of the Swendsen-Wang ghost-spin construction end to end, not
just against each other.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, get_backend, lattice
from ising_tpu.analysis import binned_error
from ising_tpu.constants import BLACK, WHITE
from ising_tpu.models import ising

Y, X = 2, 8
N = Y * X


def exact_stats(temp: float, field: float):
    """(<E_total>, <M>, <M^2>) over all 2^16 states, H = -bonds - h*M."""
    states = ((np.arange(1 << N)[:, None] >> np.arange(N)) & 1)
    s = (2.0 * states - 1.0).reshape(-1, Y, X)
    bonds = ((s * np.roll(s, -1, axis=2)).sum(axis=(1, 2))
             + (s * np.roll(s, -1, axis=1)).sum(axis=(1, 2)))
    M = s.sum(axis=(1, 2))
    H = -(bonds + field * M)
    w = np.exp(-(H - H.min()) / temp)
    w /= w.sum()
    return (float((H * w).sum()), float((M * w).sum()),
            float((M * M * w).sum()))


def check(samples_H, samples_M, temp, field, label):
    eH, eM, eM2 = exact_stats(temp, field)
    for name, series, exact in (("<E>", samples_H, eH),
                                ("<M>", samples_M, eM),
                                ("<M^2>", samples_M ** 2, eM2)):
        err = binned_error(series)
        got = float(series.mean())
        # 6-sigma band on binned (autocorrelation-absorbing) errors, with
        # an absolute floor for the near-zero-variance cases.
        tol = max(6.0 * err, 1e-9 + 0.02 * max(abs(exact), 1.0))
        assert abs(got - exact) < tol, \
            (label, name, got, exact, err)


def run_metropolis(temp, field, nsteps, seed):
    cfg = SimConfig(nrows=Y, ncols=X, temp=temp, seed=seed, backend="xla",
                    field=field)
    be = get_backend(cfg)
    b0, w0 = be.encode(*lattice.init_bits(cfg.seed, Y, X))
    thr = jnp.asarray(ising.threshold_table(temp, field))

    def body(carry, step):
        b, w = carry
        b = be.update_color(b, w, color=BLACK, thr10=thr, step=step,
                            src_up=w[-1:], src_dn=w[:1])
        w = be.update_color(w, b, color=WHITE, thr10=thr, step=step,
                            src_up=b[-1:], src_dn=b[:1])
        full = lattice.compact_to_full(b, w)
        s = 2.0 * full.astype(jnp.float32) - 1.0
        bonds = (jnp.sum(s * jnp.roll(s, -1, axis=1))
                 + jnp.sum(s * jnp.roll(s, -1, axis=0)))
        M = jnp.sum(s)
        return (b, w), (-(bonds + field * M), M)

    (_, _), (Hs, Ms) = jax.lax.scan(
        jax.jit(body), (b0, w0), jnp.arange(nsteps, dtype=jnp.uint32))
    return np.asarray(Hs, np.float64), np.asarray(Ms, np.float64)


def run_sw(temp, field, nsteps, seed):
    from ising_tpu.cluster import bond_threshold, sw_step
    full0 = jnp.asarray(lattice.compact_to_full(
        *lattice.init_bits(seed, Y, X)))
    thr = jnp.uint32(bond_threshold(temp))
    thr_g = jnp.uint32(bond_threshold(temp, abs(field)))
    sgn = 1.0 if field > 0 else (-1.0 if field < 0 else 0.0)

    def body(full, step):
        full = sw_step(full, thr, seed, step, field=sgn, thr_ghost=thr_g)
        s = 2.0 * full.astype(jnp.float32) - 1.0
        bonds = (jnp.sum(s * jnp.roll(s, -1, axis=1))
                 + jnp.sum(s * jnp.roll(s, -1, axis=0)))
        M = jnp.sum(s)
        return full, (-(bonds + field * M), M)

    _, (Hs, Ms) = jax.lax.scan(
        jax.jit(body), full0, jnp.arange(nsteps, dtype=jnp.uint32))
    return np.asarray(Hs, np.float64), np.asarray(Ms, np.float64)


@pytest.mark.parametrize("temp,field", [(2.5, 0.0), (2.0, 0.7),
                                        (3.0, -1.2)])
def test_metropolis_samples_exact_boltzmann(temp, field):
    Hs, Ms = run_metropolis(temp, field, nsteps=24000, seed=20260818)
    check(Hs[4000:], Ms[4000:], temp, field, f"met T={temp} h={field}")


@pytest.mark.parametrize("temp,field", [(2.5, 0.0), (2.0, 0.7),
                                        (3.0, -1.2)])
def test_swendsen_wang_samples_exact_boltzmann(temp, field):
    Hs, Ms = run_sw(temp, field, nsteps=12000, seed=4242)
    check(Hs[2000:], Ms[2000:], temp, field, f"sw T={temp} h={field}")
