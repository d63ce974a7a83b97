"""Cross-backend exact-trajectory parity (the SURVEY.md §4 requirement):
same seed => identical spin trajectories on every backend, in philox mode.
Pallas kernels run in interpreter mode on CPU."""

import numpy as np
import jax.numpy as jnp
import pytest

from ising_tpu import SimConfig, get_backend, lattice
from ising_tpu.constants import BLACK, WHITE
from ising_tpu.models import ising


def trajectory(cfg, nsteps, jplanes_pair=None):
    be = get_backend(cfg)
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    b, w = be.encode(b, w)
    jb = jw = None
    if jplanes_pair is not None:
        enc = getattr(be, "encode_jplanes", lambda p: p)
        jb, jw = tuple(enc(jplanes_pair[0])), tuple(enc(jplanes_pair[1]))
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    outs = []
    for step in range(nsteps):
        b = be.update_color(b, w, color=BLACK, thr10=thr,
                            step=jnp.uint32(step),
                            src_up=w[-1:], src_dn=w[:1], jplanes=jb)
        w = be.update_color(w, b, color=WHITE, thr10=thr,
                            step=jnp.uint32(step),
                            src_up=b[-1:], src_dn=b[:1], jplanes=jw)
        db, dw = be.decode(b, w)
        outs.append((np.asarray(db), np.asarray(dw)))
    return outs


def assert_same_trajectory(cfg_a, cfg_b, nsteps=3, jp=None):
    ta = trajectory(cfg_a, nsteps, jp)
    tb = trajectory(cfg_b, nsteps, jp)
    for s, ((ba, wa), (bb, wb)) in enumerate(zip(ta, tb)):
        np.testing.assert_array_equal(ba, bb, err_msg=f"black step {s}")
        np.testing.assert_array_equal(wa, wb, err_msg=f"white step {s}")


@pytest.mark.parametrize("shape", [(8, 16), (16, 32), (64, 128)])
def test_dense_matches_xla(shape):
    Y, X = shape
    base = dict(nrows=Y, ncols=X, temp=1.8, seed=4242)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="dense", **base))


def test_dense_matches_xla_multiblock():
    # Force multiple row blocks (BY < H) in the dense kernel.
    import ising_tpu.ops.pallas_dense as pd
    orig = pd._pick_block_rows
    pd._pick_block_rows = lambda nrows, target=256: 8
    try:
        base = dict(nrows=16, ncols=32, temp=2.2, seed=7)
        assert_same_trajectory(SimConfig(backend="xla", **base),
                               SimConfig(backend="dense", **base))
    finally:
        pd._pick_block_rows = orig


def test_dense_matches_xla_with_disorder():
    base = dict(nrows=16, ncols=32, temp=1.4, seed=11, j_prob=0.3)
    cfg = SimConfig(backend="xla", **base)
    v, h = ising.generate_disorder_links(cfg.seed, cfg.nrows, cfg.ncols,
                                         cfg.j_prob)
    jp = (lattice.links_to_color_planes(v, h, BLACK),
          lattice.links_to_color_planes(v, h, WHITE))
    assert_same_trajectory(cfg, SimConfig(backend="dense", **base), jp=jp)


def test_dense_rejects_sublattice():
    with pytest.raises(NotImplementedError):
        get_backend(SimConfig(nrows=16, ncols=16, backend="dense",
                              xsl=8, ysl=8))


def test_pack_round_trip():
    import numpy as np
    from ising_tpu.ops.pallas_packed import pack_bits, unpack_bits
    rs = np.random.RandomState(2)
    bits = jnp.asarray(rs.randint(0, 2, size=(6, 32)).astype("uint8"))
    packed = pack_bits(bits)
    assert packed.shape == (6, 4)
    np.testing.assert_array_equal(np.asarray(unpack_bits(packed)),
                                  np.asarray(bits))


@pytest.mark.parametrize("shape", [(8, 32), (16, 64), (64, 256)])
def test_packed_matches_xla(shape):
    Y, X = shape
    base = dict(nrows=Y, ncols=X, temp=1.8, seed=4242)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="packed", **base))


def test_packed_matches_xla_multiblock():
    import ising_tpu.ops.pallas_dense as pd
    orig = pd._pick_block_rows
    pd._pick_block_rows = lambda nrows, target=256: 8
    try:
        base = dict(nrows=32, ncols=64, temp=2.2, seed=7)
        assert_same_trajectory(SimConfig(backend="xla", **base),
                               SimConfig(backend="packed", **base))
    finally:
        pd._pick_block_rows = orig


def test_packed_matches_xla_with_disorder():
    base = dict(nrows=16, ncols=64, temp=1.4, seed=11, j_prob=0.3)
    cfg = SimConfig(backend="xla", **base)
    v, h = ising.generate_disorder_links(cfg.seed, cfg.nrows, cfg.ncols,
                                         cfg.j_prob)
    jp = (lattice.links_to_color_planes(v, h, BLACK),
          lattice.links_to_color_planes(v, h, WHITE))
    assert_same_trajectory(cfg, SimConfig(backend="packed", **base), jp=jp)


def test_packed_zero_temperature():
    # Greedy quench class (thr[7]=0.5 coin flip at dE==0) must match too.
    base = dict(nrows=16, ncols=32, temp=0.0, seed=13)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="packed", **base), nsteps=5)


@pytest.mark.parametrize("shape", [(128, 256), (256, 512)])
def test_mxu_matches_xla(shape):
    Y, X = shape
    base = dict(nrows=Y, ncols=X, temp=1.8, seed=99)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="mxu", **base), nsteps=2)


def test_mxu_rejects_unsupported():
    with pytest.raises(NotImplementedError):
        get_backend(SimConfig(nrows=128, ncols=256, backend="mxu",
                              j_prob=0.5))
    with pytest.raises(ValueError):
        get_backend(SimConfig(nrows=64, ncols=256, backend="mxu"))


def test_packed_sublattice_matches_xla():
    # ncols/16 = 8 word-group width; xsl/2 = 8 divides it; ysl = 8.
    base = dict(nrows=16, ncols=128, temp=1.5, seed=21, xsl=16, ysl=8)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="packed", **base))


def test_packed_sublattice_full_width_groups():
    # csl == W edge case: every field group is one sub-lattice column-wise.
    base = dict(nrows=16, ncols=64, temp=1.6, seed=23, xsl=8, ysl=8)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="packed", **base))


def test_packed_sublattice_rejects_bad_geometry():
    with pytest.raises(ValueError):
        get_backend(SimConfig(nrows=16, ncols=64, backend="packed",
                              xsl=32, ysl=8))  # csl=16 > W=4


@pytest.mark.parametrize("rng", ["threefry", "threefry13", "philox7",
                                 "chacha8", "chacha6", "chacha4"])
@pytest.mark.parametrize("backend", ["dense", "packed", "mxu"])
def test_rng_modes_match_xla(backend, rng):
    shape = (128, 256) if backend == "mxu" else (16, 64)
    base = dict(nrows=shape[0], ncols=shape[1], temp=1.8, seed=515,
                rng=rng)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend=backend, **base), nsteps=2)


@pytest.mark.parametrize("fused", ["1", "2"])
@pytest.mark.parametrize("rng", ["philox", "threefry13"])
def test_fused_step_matches_unfused(rng, fused, monkeypatch):
    """Both fused both-colors kernels (v1 BlockSpec-pipelined, v2 manual
    DMA) must reproduce the two-call path bit-for-bit (same RNG contract,
    same halo semantics)."""
    monkeypatch.setenv("ISING_TPU_FUSED", fused)
    import jax.numpy as jnp
    cfg = SimConfig(nrows=2048, ncols=64, temp=1.8, seed=777, backend="packed",
                    rng=rng)
    be = get_backend(cfg)
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    pb, pw = be.encode(b, w)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    assert be.fusable(cfg.nrows)

    # unfused
    ub = be.update_color(pb, pw, color=BLACK, thr10=thr, step=jnp.uint32(3),
                         src_up=pw[-1:], src_dn=pw[:1])
    uw = be.update_color(pw, ub, color=WHITE, thr10=thr, step=jnp.uint32(3),
                         src_up=ub[-1:], src_dn=ub[:1])
    # fused
    fb, fw = be.update_step(pb, pw, thr10=thr, step=jnp.uint32(3))
    np.testing.assert_array_equal(np.asarray(ub), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(uw), np.asarray(fw))


@pytest.mark.parametrize("nrows,by", [(24, 8), (40, 8), (2048, 256)])
def test_fused_manual_block_edge_cases(nrows, by, monkeypatch):
    """v2 manual-DMA fused kernel at the minimum block count (3) and at
    block counts exercising every ring-slot / drain alignment."""
    monkeypatch.setenv("ISING_TPU_FUSED", "2")
    monkeypatch.setenv("ISING_TPU_FUSED_BY", str(by))
    import jax.numpy as jnp
    from ising_tpu.constants import BLACK, WHITE
    cfg = SimConfig(nrows=nrows, ncols=64, temp=1.8, seed=31,
                    backend="packed", rng="threefry13")
    be = get_backend(cfg)
    b, w = lattice.init_bits(cfg.seed, cfg.nrows, cfg.ncols)
    pb, pw = be.encode(b, w)
    thr = jnp.asarray(ising.threshold_table(cfg.temperature))
    assert be.fusable(cfg.nrows)

    ub = be.update_color(pb, pw, color=BLACK, thr10=thr, step=jnp.uint32(5),
                         src_up=pw[-1:], src_dn=pw[:1])
    uw = be.update_color(pw, ub, color=WHITE, thr10=thr, step=jnp.uint32(5),
                         src_up=ub[-1:], src_dn=ub[:1])
    fb, fw = be.update_step(pb, pw, thr10=thr, step=jnp.uint32(5))
    np.testing.assert_array_equal(np.asarray(ub), np.asarray(fb))
    np.testing.assert_array_equal(np.asarray(uw), np.asarray(fw))


@pytest.mark.parametrize("shape", [(8, 64), (16, 128), (64, 256)])
def test_bit1_matches_xla(shape):
    Y, X = shape
    base = dict(nrows=Y, ncols=X, temp=1.8, seed=4242)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base))


@pytest.mark.parametrize("rng", ["threefry13", "philox7", "philox",
                                 "chacha8", "chacha6", "chacha4"])
def test_bit1_rng_modes_match_xla(rng):
    base = dict(nrows=16, ncols=128, temp=1.8, seed=515, rng=rng)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base), nsteps=2)


def test_bit1_multiblock_matches_xla():
    import ising_tpu.ops.pallas_dense as pd
    orig = pd._pick_block_rows
    pd._pick_block_rows = lambda nrows, target=256: 8
    try:
        base = dict(nrows=32, ncols=64, temp=2.2, seed=7)
        assert_same_trajectory(SimConfig(backend="xla", **base),
                               SimConfig(backend="bit1", **base))
    finally:
        pd._pick_block_rows = orig


def test_bit1_zero_temperature():
    base = dict(nrows=16, ncols=64, temp=0.0, seed=13)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base), nsteps=5)


@pytest.mark.parametrize("rng", ["threefry13b", "philox7b", "chacha8b",
                                 "chacha6b", "chacha4b"])
def test_bit1_plane_modes_match_xla(rng):
    """Bit-plane contract: bit1's in-kernel bit-serial accept must equal
    xla's unpacked implementation bit for bit."""
    base = dict(nrows=16, ncols=128, temp=1.8, seed=515, rng=rng)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base), nsteps=3)


def test_bit1_plane_mode_multiblock_and_greedy():
    import ising_tpu.ops.pallas_dense as pd
    orig = pd._pick_block_rows
    pd._pick_block_rows = lambda nrows, target=256: 8
    try:
        base = dict(nrows=32, ncols=64, temp=2.2, seed=7, rng="threefry13b")
        assert_same_trajectory(SimConfig(backend="xla", **base),
                               SimConfig(backend="bit1", **base))
    finally:
        pd._pick_block_rows = orig
    base = dict(nrows=16, ncols=64, temp=0.0, seed=13, rng="threefry13b")
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base), nsteps=4)


def test_plane_modes_fenced_on_unsupported_backends():
    for backend in ("dense", "packed", "mxu"):
        with pytest.raises(NotImplementedError, match="bit-plane"):
            get_backend(SimConfig(nrows=128, ncols=256, temp=1.5,
                                  backend=backend, rng="threefry13b"))
    with pytest.raises(ValueError, match="ncols % 64"):
        get_backend(SimConfig(nrows=8, ncols=32, temp=1.5, backend="xla",
                              rng="threefry13b"))


def test_bit1_pack_round_trip():
    from ising_tpu.ops.pallas_bit1 import pack_bits1, unpack_bits1
    rs = np.random.RandomState(5)
    bits = jnp.asarray(rs.randint(0, 2, size=(6, 128)).astype("uint8"))
    packed = pack_bits1(bits)
    assert packed.shape == (6, 4)
    np.testing.assert_array_equal(np.asarray(unpack_bits1(packed)),
                                  np.asarray(bits))


def test_bit1_rejects_unsupported():
    # xsl/2 = 4 exceeds W1 = ncols/64 = 1: geometry the 1-bit layout
    # cannot wrap in-lane (replica mode itself IS supported; see the
    # test_bit1_sublattice_* cases).
    with pytest.raises(ValueError, match="divide"):
        get_backend(SimConfig(nrows=16, ncols=64, backend="bit1",
                              xsl=8, ysl=8))


@pytest.mark.parametrize("rng", ["threefry13", "philox7b", "chacha8b"])
def test_bit1_disorder_matches_xla(rng):
    """bit1's bit-sliced J-XOR must reproduce xla's disorder trajectories
    in both the u32 and bit-plane rng contracts."""
    base = dict(nrows=16, ncols=128, temp=1.7, seed=31, rng=rng, j_prob=0.35)
    cfg = SimConfig(backend="xla", **base)
    v, h = ising.generate_disorder_links(cfg.seed, cfg.nrows, cfg.ncols,
                                         cfg.j_prob)
    jp = (lattice.links_to_color_planes(v, h, BLACK),
          lattice.links_to_color_planes(v, h, WHITE))
    assert_same_trajectory(cfg, SimConfig(backend="bit1", **base), jp=jp,
                           nsteps=3)

def test_bit1_sublattice_matches_xla():
    # W1 = ncols/64 = 4; csl = xsl/2 = 2 divides it; ysl = 8.
    base = dict(nrows=16, ncols=256, temp=1.5, seed=21, xsl=4, ysl=8)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base))


def test_bit1_sublattice_full_width_groups():
    # csl == W1 edge case: the wrap roll spans the whole lane dimension.
    base = dict(nrows=16, ncols=128, temp=1.6, seed=23, xsl=4, ysl=8)
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base))


def test_bit1_sublattice_multiblock():
    # Vertical sub-lattice wrap through the block edge arrays (BY < H).
    import ising_tpu.ops.pallas_dense as pd
    orig = pd._pick_block_rows
    pd._pick_block_rows = lambda nrows, target=256: 8
    try:
        base = dict(nrows=32, ncols=256, temp=1.7, seed=31, xsl=4, ysl=16)
        assert_same_trajectory(SimConfig(backend="xla", **base),
                               SimConfig(backend="bit1", **base))
    finally:
        pd._pick_block_rows = orig


def test_bit1_sublattice_bitplane_rng():
    # Replica wrap composed with the bit-serial accept path ("...b" modes).
    base = dict(nrows=16, ncols=256, temp=1.5, seed=77, xsl=4, ysl=8,
                rng="threefry13b")
    assert_same_trajectory(SimConfig(backend="xla", **base),
                           SimConfig(backend="bit1", **base))


def test_bit1_sublattice_rejects_bad_geometry():
    with pytest.raises(ValueError, match="divide"):
        get_backend(SimConfig(nrows=16, ncols=128, backend="bit1",
                              xsl=8, ysl=8))  # csl=4 > W1=2
