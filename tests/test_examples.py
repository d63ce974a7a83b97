"""Smoke tests for the example scripts and bench entry (CPU, tiny sizes) —
keeps the shipped demos from rotting as the library evolves."""

import io
import contextlib
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run_path(script, argv):
    import runpy
    old = sys.argv
    sys.argv = [script] + argv
    try:
        with contextlib.redirect_stdout(io.StringIO()) as out:
            try:
                runpy.run_path(str(ROOT / script), run_name="__main__")
            except SystemExit as e:
                assert not e.code, f"{script} exited {e.code}"
    finally:
        sys.argv = old
    return out.getvalue()


def test_tc_sweep_quick():
    out = _run_path("examples/tc_sweep.py",
                    ["--sizes", "8,16", "--replicas", "8", "--warmup", "20",
                     "--measure", "12", "--ntemps", "3"])
    assert "Binder crossing estimate" in out


def test_giant_lattice_tiny():
    out = _run_path("examples/giant_lattice.py",
                    ["--rows", "16", "--cols", "64", "--steps", "4"])
    assert "|m| =" in out and "E/N =" in out


def test_spin_glass_pt_tiny():
    out = _run_path("examples/spin_glass_pt.py",
                    ["--size", "16", "--rungs", "3", "--rounds", "8",
                     "--sweeps", "2", "--realizations", "2"])
    assert "pair acceptance:" in out and "cold rung" in out
    assert "<|q|>" in out and "[g]_av" in out


def test_xi_scan_tiny():
    out = _run_path("examples/xi_scan.py",
                    ["--sizes", "8,16", "--ntemps", "3", "--warmup", "5",
                     "--samples", "12"])
    assert "crossing estimate" in out


def test_cluster_vs_metropolis_tiny():
    out = _run_path("examples/cluster_vs_metropolis.py",
                    ["--size", "16", "--warmup", "20", "--samples", "64",
                     "--sw-samples", "32"])
    assert "Swendsen-Wang" in out and "speedup" in out


def test_reweight_peak_tiny():
    out = _run_path("examples/reweight_peak.py",
                    ["--size", "16", "--ntemps", "3", "--warmup", "40",
                     "--samples", "40", "--every", "2"])
    assert "WHAM converged" in out and "C/N peak" in out


def test_hysteresis_tiny():
    out = _run_path("examples/hysteresis.py",
                    ["--size", "16", "--hmax", "1.0", "--steps", "5",
                     "--sweeps", "4"])
    assert "loop area" in out


def test_bench_disorder_cpu():
    import json
    import bench
    with contextlib.redirect_stdout(io.StringIO()) as out:
        rc = bench.main(["--backend", "packed", "--j", "0.3",
                         "--rows", "64", "--cols", "64", "--steps", "2"])
    assert rc == 0
    line = json.loads(out.getvalue().strip().splitlines()[-1])
    assert line["detail"]["j_prob"] == 0.3
    assert line["value"] > 0
