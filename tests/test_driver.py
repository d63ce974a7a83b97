"""End-to-end driver: run loop, schedules, early exit, ramp, checkpoint."""

import numpy as np
import pytest

from ising_tpu import SimConfig
from ising_tpu.driver import Simulation, exponential_print_steps


def test_exponential_schedule():
    s = exponential_print_steps(16)
    assert s[0] == 1 and s[-1] == 16
    assert s == sorted(set(s))
    assert 11 in s  # rint(2^(14/4)) = 11


def test_run_basic(capsys):
    cfg = SimConfig(nrows=32, ncols=32, temp=1.5, seed=1, niters=8,
                    print_freq=4)
    sim = Simulation(cfg)
    res = sim.run(log=print)
    assert res["steps"] == 8
    out = capsys.readouterr().out
    assert "magnetization" in out
    assert "flips/ns" in out


def test_run_warmup_continues_counters():
    """warmup + n steps must equal a plain (warmup+n)-step run."""
    base = dict(nrows=16, ncols=16, temp=2.0, seed=9)
    s1 = Simulation(SimConfig(niters=6, **base))
    s1.run(log=lambda *a: None)
    s2 = Simulation(SimConfig(niters=4, nwarmup=2, **base))
    s2.run(log=lambda *a: None)
    b1, w1 = s1.bits()
    b2, w2 = s2.bits()
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_early_exit():
    # At T=6 an all-up lattice melts to m ~ 0 quickly; target 0 triggers exit.
    cfg = SimConfig(nrows=64, ncols=64, temp=6.0, seed=2, niters=500,
                    print_freq=10, tgt_magn=0.0)
    sim = Simulation(cfg)
    res = sim.run(log=lambda *a: None)
    assert res["stopped_early"]
    assert res["steps"] < 500
    assert res["magnetization"] < 1e-3


def test_temperature_ramp():
    cfg = SimConfig(nrows=16, ncols=16, temp=1.5, seed=3, niters=10,
                    temp_step=0.5, temp_freq=4)
    sim = Simulation(cfg)
    res = sim.run(log=lambda *a: None)
    assert res["temp_final"] == pytest.approx(2.5)


def test_temperature_ramp_clamps_at_min():
    from ising_tpu.constants import MIN_TEMP
    cfg = SimConfig(nrows=16, ncols=16, temp=0.5, seed=3, niters=4,
                    temp_step=-1.0, temp_freq=2)
    sim = Simulation(cfg)
    sim.run(log=lambda *a: None)
    assert sim.temp == pytest.approx(MIN_TEMP)


def test_temperature_ramp_bit1_hw_rebuilds_static_thresholds():
    """bit1-hw bakes k-bit accept thresholds in statically; a ramp must
    rebuild the stepper with the new temperature's thresholds (and the
    dynamics must stay physical: a cold ordered lattice stays ordered)."""
    import jax.numpy as jnp
    from ising_tpu import observables
    cfg = SimConfig(nrows=16, ncols=64, temp=1.2, seed=3, niters=8,
                    backend="bit1", rng="hw", temp_step=-0.2, temp_freq=2)
    sim = Simulation(cfg)
    ch = cfg.ncols // 2
    sim.black, sim.white = sim.backend.encode(
        jnp.ones((16, ch), jnp.uint8), jnp.ones((16, ch), jnp.uint8))
    res = sim.run(log=lambda *a: None)
    assert sim.backend.temperature == pytest.approx(res["temp_final"])
    assert res["temp_final"] == pytest.approx(1.2 - 0.2 * 4)
    m = observables.magnetization(*sim.bits())
    assert m > 0.95, f"ordered state melted during cold ramp ({m})"


def test_checkpoint_resume_exact(tmp_path):
    base = dict(nrows=16, ncols=32, temp=1.8, seed=11)
    # straight 10-step run
    s1 = Simulation(SimConfig(niters=10, **base))
    s1.advance(10)
    # 5 steps, checkpoint, resume, 5 more
    s2 = Simulation(SimConfig(niters=10, **base))
    s2.advance(5)
    path = str(tmp_path / "ck.npz")
    s2.checkpoint(path)
    s3 = Simulation.from_checkpoint(path)
    assert s3.step == 5
    s3.advance(5)
    b1, w1 = s1.bits()
    b3, w3 = s3.bits()
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b3))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w3))


def test_checkpoint_preserves_ramped_temp(tmp_path):
    cfg = SimConfig(nrows=16, ncols=16, temp=1.5, seed=3, niters=4,
                    temp_step=0.25, temp_freq=2)
    sim = Simulation(cfg)
    sim.run(log=lambda *a: None)
    path = str(tmp_path / "ck.npz")
    sim.checkpoint(path)
    sim2 = Simulation.from_checkpoint(path)
    assert sim2.temp == pytest.approx(sim.temp)


def test_run_sharded_matches_single():
    base = dict(nrows=32, ncols=32, temp=1.9, seed=17, niters=5)
    s1 = Simulation(SimConfig(ndev=1, **base))
    s1.run(log=lambda *a: None)
    s8 = Simulation(SimConfig(ndev=8, **base))
    s8.run(log=lambda *a: None)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s8.bits()[0]))


def test_run_with_disorder_and_corr(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    cfg = SimConfig(nrows=16, ncols=16, temp=1.5, seed=5, niters=4,
                    print_freq=2, j_prob=0.3, corr_out=True)
    sim = Simulation(cfg)
    res = sim.run(log=lambda *a: None)
    assert res["steps"] == 4
    corrs = list(tmp_path.glob("corr_*"))
    assert len(corrs) == 1
    lines = corrs[0].read_text().strip().splitlines()
    assert len(lines) == 2  # measurements at steps 2 and 4


def test_run_sharded_packed_backend():
    base = dict(nrows=32, ncols=64, temp=1.9, seed=17, niters=4)
    s1 = Simulation(SimConfig(ndev=1, backend="packed", **base))
    s1.run(log=lambda *a: None)
    s8 = Simulation(SimConfig(ndev=8, backend="packed", **base))
    s8.run(log=lambda *a: None)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s8.bits()[0]))
    # and equals the xla trajectory
    sx = Simulation(SimConfig(ndev=1, backend="xla", **base))
    sx.run(log=lambda *a: None)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(sx.bits()[0]))


def test_checkpoint_resume_packed(tmp_path):
    base = dict(nrows=16, ncols=32, temp=1.8, seed=11, backend="packed")
    s1 = Simulation(SimConfig(niters=10, **base))
    s1.advance(10)
    s2 = Simulation(SimConfig(niters=10, **base))
    s2.advance(5)
    path = str(tmp_path / "ck.npz")
    s2.checkpoint(path)
    s3 = Simulation.from_checkpoint(path)
    assert s3.cfg.backend == "packed"
    s3.advance(5)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s3.bits()[0]))


def test_checkpoint_resume_across_device_counts(tmp_path):
    """Save at ndev=1, resume at ndev=8 (and the reverse): bit-identical
    continuation. The elasticity story the counter-RNG design promises
    (draws are functions of GLOBAL row indices, so the sharding layout is
    free to change at resume time); the reference cannot reload at all
    (optimized/utils.c:97-107, Fread unused)."""
    base = dict(nrows=32, ncols=32, temp=1.8, seed=11, niters=10)
    for nd_save, nd_resume in ((1, 8), (8, 1), (8, 4)):
        s1 = Simulation(SimConfig(ndev=nd_save, **base))
        s1.advance(10)
        s2 = Simulation(SimConfig(ndev=nd_save, **base))
        s2.advance(5)
        path = str(tmp_path / f"ck_{nd_save}to{nd_resume}.bin")
        s2.checkpoint(path)
        s3 = Simulation.from_checkpoint(path, ndev=nd_resume)
        assert s3.cfg.ndev == nd_resume and s3.step == 5
        s3.advance(5)
        np.testing.assert_array_equal(
            np.asarray(s1.bits()[0]), np.asarray(s3.bits()[0]),
            err_msg=f"black diverged resuming ndev={nd_save}->{nd_resume}")
        np.testing.assert_array_equal(
            np.asarray(s1.bits()[1]), np.asarray(s3.bits()[1]),
            err_msg=f"white diverged resuming ndev={nd_save}->{nd_resume}")


def test_bit1_storage_domain_checkpoint(tmp_path, monkeypatch):
    """bit1 checkpoints through the word-domain shuffle (no decode):
    the file must be BYTE-IDENTICAL to the decode-path file, the fast
    resume must land in the same storage words, and cross-backend
    portability must be unaffected."""
    import dataclasses
    from ising_tpu.ops import pallas_bit1 as pb1

    base = dict(nrows=8, ncols=512, temp=1.8, seed=21, niters=10)
    cfg = SimConfig(backend="bit1", **base)
    s = Simulation(cfg)
    s.advance(4)

    # unit round trip: words -> packed bytes -> words, and byte equality
    # with the decode-path packing
    from ising_tpu.checkpoint import _pack_rows
    pb = pb1.words_to_packed_rows(s.black)
    np.testing.assert_array_equal(
        np.asarray(pb), np.asarray(_pack_rows(pb1.unpack_bits1(s.black))))
    back = pb1.packed_rows_to_words(np.asarray(pb), s.black.shape[1])
    np.testing.assert_array_equal(np.asarray(back), np.asarray(s.black))

    fast = str(tmp_path / "fast.ck")
    s.checkpoint(fast)
    # decode-path file (fast path disabled)
    monkeypatch.delattr(type(s.backend), "pack_storage_rows")
    slow = str(tmp_path / "slow.ck")
    s.checkpoint(slow)
    assert open(fast, "rb").read() == open(slow, "rb").read()

    # fast resume (bit1) and cross-backend resume (xla) both continue
    # bit-identically
    monkeypatch.undo()
    ref = Simulation(cfg)
    ref.advance(10)
    for target in ("bit1", "xla"):
        r = Simulation.from_checkpoint(fast, backend=target)
        assert r.step == 4
        r.advance(6)
        np.testing.assert_array_equal(np.asarray(ref.bits()[0]),
                                      np.asarray(r.bits()[0]),
                                      err_msg=f"resume into {target}")


def test_checkpoint_resume_across_backends(tmp_path):
    """A checkpoint written by one backend resumes exactly on another."""
    import dataclasses
    base = dict(nrows=16, ncols=32, temp=1.8, seed=11)
    s1 = Simulation(SimConfig(niters=10, backend="xla", **base))
    s1.advance(10)
    s2 = Simulation(SimConfig(niters=10, backend="packed", **base))
    s2.advance(5)
    path = str(tmp_path / "ck.npz")
    s2.checkpoint(path)
    s3 = Simulation.from_checkpoint(path, backend="xla")
    s3.advance(5)
    np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                  np.asarray(s3.bits()[0]))


def test_run_exponential_schedule(capsys):
    cfg = SimConfig(nrows=16, ncols=16, temp=1.5, seed=2, niters=16,
                    print_exp=True)
    res = Simulation(cfg).run(log=print)
    out = capsys.readouterr().out
    # schedule hits 1,2,3,4,5,6,7,8,10,11,13,16 -> 12 measurement lines
    assert out.count("(iter:") >= 10
    assert res["steps"] == 16


def test_minimal_geometry():
    cfg = SimConfig(nrows=2, ncols=8, temp=2.0, seed=3, niters=4)
    res = Simulation(cfg).run(log=lambda *a: None)
    assert res["steps"] == 4


def test_reference_exp_times():
    """Exact semantics of the reference's generate_times
    (optimized/main.cu:1211-1228): start 152, first rint(2^(j/4)) >= 2x
    previous, scan while the last time is below nsteps."""
    from ising_tpu.driver import reference_exp_times
    ts = reference_exp_times(10000)
    assert ts[0] == 152
    for a, b in zip(ts, ts[1:]):
        assert b >= 2 * a
    # each entry (after the first) is the FIRST series value >= 2x previous
    import math
    for a, b in zip(ts, ts[1:]):
        j = 0
        while int(round(2.0 ** (j / 4.0))) < 2 * a:
            j += 1
        assert b == int(round(2.0 ** (j / 4.0)))
    # append-past-nsteps edge case: last entry may exceed nsteps
    short = reference_exp_times(300)
    assert short[0] == 152 and short[-1] >= 300


def test_exp_thinned_run(capsys):
    from ising_tpu.driver import Simulation
    cfg = SimConfig(nrows=16, ncols=16, temp=2.0, seed=1, backend="xla",
                    niters=200, print_exp=True, exp_thinned=True)
    out = Simulation(cfg).run(log=lambda s: None)
    steps = [s for s, _ in out["series"]]
    assert 152 in steps


def test_disorder_chunked_build_matches_one_shot():
    """Row-chunked disorder init (links + jplanes) is bit-identical to the
    one-shot path, for the plane backends and the packed encode."""
    import numpy as np
    for backend in ("xla", "packed"):
        base = dict(nrows=32, ncols=64, temp=1.6, seed=9, j_prob=0.3,
                    backend=backend)
        from ising_tpu.driver import build_disorder
        s1 = Simulation(SimConfig(**base))            # one-shot (32 <= 8192)
        s2 = Simulation(SimConfig(**base))
        s2._links_store, s2._links_packed, jp2 = build_disorder(
            s2.cfg, s2.backend, chunk_rows=8)
        np.testing.assert_array_equal(np.asarray(s1._links_store[0]),
                                      np.asarray(s2._links_store[0]))
        np.testing.assert_array_equal(np.asarray(s1._links_store[1]),
                                      np.asarray(s2._links_store[1]))
        # the public accessor always yields uint8 planes
        lv, lh = s1.links()
        assert lv.dtype == np.uint8 and lv.shape == (32, 64)
        _, _, jp1 = build_disorder(s1.cfg, s1.backend)
        for a, b in zip(jp1, jp2):
            for pa, pb in zip(a, b):
                np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
        # and the trajectories agree when stepping with the chunk-built sim
        s1.advance(3)
        s2.advance(3)
        np.testing.assert_array_equal(np.asarray(s1.bits()[0]),
                                      np.asarray(s2.bits()[0]))


def test_energy_with_disorder_streamed_matches_direct():
    """Driver energy (streamed decode + packed links) == direct computation
    on decoded planes with freshly generated links."""
    from ising_tpu import observables
    from ising_tpu.models import ising
    for backend in ("xla", "packed"):
        cfg = SimConfig(nrows=16, ncols=64, temp=1.6, seed=21, j_prob=0.4,
                        backend=backend, niters=2)
        sim = Simulation(cfg)
        sim.advance(2)
        v, h = ising.generate_disorder_links(cfg.seed, 16, 64, 0.4)
        want = observables.energy_per_spin(*sim.bits(), v, h)
        assert sim.energy() == pytest.approx(want, abs=1e-12), backend

def test_checkpoint_streamed_chunks_match_one_shot(tmp_path):
    """Tiny-chunk streamed save round-trips to the same state as the
    one-chunk save (the body interleaves black/white per chunk, so bytes
    legitimately differ; the LOADED state must not), and the chunk-encoded
    resume continues the exact trajectory."""
    from ising_tpu.checkpoint import (load_checkpoint,
                                      load_checkpoint_state,
                                      save_checkpoint_streamed)
    base = dict(nrows=16, ncols=32, temp=1.8, seed=11, backend="packed")
    s = Simulation(SimConfig(niters=10, **base))
    s.advance(5)
    be = s.backend
    dec = lambda r0, r1: be.decode(s.black[r0:r1], s.white[r0:r1])
    p1 = str(tmp_path / "one.ck")
    p2 = str(tmp_path / "chunked.ck")
    save_checkpoint_streamed(p1, dec, 16, 32, step=5, temp=s.temp, cfg=s.cfg)
    save_checkpoint_streamed(p2, dec, 16, 32, step=5, temp=s.temp, cfg=s.cfg,
                             chunk_rows=4)
    b1, w1, *_ = load_checkpoint(p1)
    b2, w2, *_ = load_checkpoint(p2)
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    # storage-domain resume (chunk-wise encode) == bits-domain resume
    (b_store, w_store), meta = load_checkpoint_state(p2, be.encode)
    np.testing.assert_array_equal(np.asarray(b_store), np.asarray(s.black))
    assert meta["step"] == 5
    s3 = Simulation.from_checkpoint(p2)
    s.advance(5)
    s3.advance(5)
    np.testing.assert_array_equal(np.asarray(s.bits()[0]),
                                  np.asarray(s3.bits()[0]))


def test_checkpoint_truncated_file_rejected(tmp_path):
    base = dict(nrows=16, ncols=32, temp=1.8, seed=11)
    s = Simulation(SimConfig(niters=2, **base))
    path = str(tmp_path / "ck.bin")
    s.checkpoint(path)
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:-7])
    with pytest.raises(ValueError, match="truncated"):
        Simulation.from_checkpoint(path)
    open(path, "wb").write(b"NOTACKPT" + blob[8:])
    with pytest.raises(ValueError, match="magic"):
        Simulation.from_checkpoint(path)
    # A v1 (.npz) checkpoint gets a targeted error, not "bad magic".
    np.savez(path + ".npz", black=np.zeros((16, 16), np.uint8))
    with pytest.raises(ValueError, match="v1 .*no longer supported"):
        Simulation.from_checkpoint(path + ".npz")
    # Header geometry contradicting the embedded config (same-length edit
    # so only the consistency check can catch it).
    mutated = blob.replace(b'"nrows": 16', b'"nrows": 61', 1)
    assert mutated != blob
    open(path, "wb").write(mutated)
    with pytest.raises(ValueError, match="embedded config"):
        Simulation.from_checkpoint(path)


def test_checkpoint_resume_syncs_static_temp_backend(tmp_path):
    """Resuming a ramped run on a temp_static backend (bit1-hw) must bake
    the RESUMED temperature into the kernel, not cfg's start temperature."""
    cfg = SimConfig(nrows=16, ncols=64, temp=2.5, seed=7, backend="bit1",
                    rng="hw")
    s = Simulation(cfg)
    s.advance(2)
    s.set_temperature(1.0)
    s.advance(2)
    path = str(tmp_path / "ck.bin")
    s.checkpoint(path)
    s2 = Simulation.from_checkpoint(path)
    assert s2.temp == pytest.approx(1.0)
    assert s2.backend.temperature == pytest.approx(1.0)
    s2.advance(1)  # and the stepper traces with the synced thresholds

def test_bit1_disordered_energy_word_domain(tmp_path):
    """Driver energy() on disordered bit1 takes the no-decode word path and
    agrees exactly with the streamed byte-plane path (xla backend, same
    trajectory)."""
    base = dict(nrows=16, ncols=128, temp=1.5, seed=9, j_prob=0.35)
    sb = Simulation(SimConfig(backend="bit1", **base))
    sx = Simulation(SimConfig(backend="xla", **base))
    sb.advance(3)
    sx.advance(3)
    np.testing.assert_array_equal(np.asarray(sb.bits()[0]),
                                  np.asarray(sx.bits()[0]))
    assert sb.energy() == sx.energy()
    # the public links() accessor round-trips the parity-split store
    lv, lh = sb.links()
    lv2, lh2 = sx.links()
    np.testing.assert_array_equal(np.asarray(lv), np.asarray(lv2))
    np.testing.assert_array_equal(np.asarray(lh), np.asarray(lh2))

def test_bit1_split_links_multiblock_matches_xla():
    """In-kernel link projection with BY < H: the j_up derivation crosses
    block edges via the vE/vO edge arrays (periodic at row 0)."""
    import ising_tpu.ops.pallas_dense as pd
    orig = pd._pick_block_rows
    pd._pick_block_rows = lambda nrows, target=256: 8
    try:
        base = dict(nrows=32, ncols=128, temp=1.4, seed=13, j_prob=0.35)
        sb = Simulation(SimConfig(backend="bit1", **base))
        assert sb.backend.split_links  # the driver enabled the split path
        sx = Simulation(SimConfig(backend="xla", **base))
        sb.advance(3)
        sx.advance(3)
        np.testing.assert_array_equal(np.asarray(sb.bits()[0]),
                                      np.asarray(sx.bits()[0]))
        np.testing.assert_array_equal(np.asarray(sb.bits()[1]),
                                      np.asarray(sx.bits()[1]))
        assert sb.energy() == sx.energy()
    finally:
        pd._pick_block_rows = orig
