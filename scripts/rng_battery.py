"""Build and run the reduced-round ChaCha qualification battery.

Compiles native/rngtest.cpp (the consumption-layout statistical battery —
see its header for the test list and verdict rules) and runs it for
chacha2/4/6/8, writing one log per mode to docs/rng_battery/. chacha2 is
the TEETH case: it must FAIL, demonstrating the battery detects a weak
generator at these sample sizes. chacha8 is the control (crypto-grade,
must PASS). The qualified tiers shipped in rng.RNG_MODES are the modes
that PASS here: chacha4 (minimum passing) and chacha6 (margin).

Usage: python scripts/rng_battery.py [--log2q 16] [--steps 256]
       (defaults = 2^25 blocks = 2 GiB of keystream per mode,
        ~2 min/mode on one host core)
"""

import argparse
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "ising_tpu", "native", "rngtest.cpp")
OUT = os.path.join(ROOT, "docs", "rng_battery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2q", type=int, default=16)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--rounds", type=int, nargs="*", default=[2, 4, 6, 8])
    args = ap.parse_args()

    binary = os.path.join(OUT, "_rngtest")
    os.makedirs(OUT, exist_ok=True)
    subprocess.run(["g++", "-O3", "-march=native", "-o", binary, SRC],
                   check=True)

    gib = (1 << (args.log2q + 1)) * args.steps * 64 / (1 << 30)
    verdicts = {}
    for r in args.rounds:
        log = os.path.join(OUT, f"chacha{r}_{gib:g}GiB.log")
        print(f"chacha{r}: {gib:g} GiB keystream -> {log}", flush=True)
        p = subprocess.run([binary, str(r), str(args.log2q),
                            str(args.steps)],
                           capture_output=True, text=True)
        with open(log, "w") as f:
            f.write(p.stdout)
        # A statistical FAIL is returncode 1 WITH a VERDICT line; anything
        # else (crash, signal, empty output) is a battery malfunction, not
        # a result.
        verdict_lines = [ln for ln in p.stdout.splitlines()
                         if ln.startswith("VERDICT")]
        if p.returncode not in (0, 1) or not verdict_lines:
            print(f"ERROR: rngtest crashed on chacha{r} "
                  f"(rc={p.returncode}): {p.stderr.strip()[:200]}",
                  file=sys.stderr)
            return 2
        print(verdict_lines[-1], flush=True)
        verdicts[r] = "FAIL" if p.returncode else "PASS/WEAK"

    os.unlink(binary)
    if 2 in args.rounds and verdicts.get(2) != "FAIL":
        print("ERROR: chacha2 passed — the battery has lost its teeth",
              file=sys.stderr)
        return 1
    bad = [r for r in args.rounds if r >= 4 and verdicts[r] == "FAIL"]
    if bad:
        print(f"ERROR: qualified tiers failed: chacha{bad}",
              file=sys.stderr)
        return 1
    print("battery ok: " + ", ".join(
        f"chacha{r}={verdicts[r]}" for r in args.rounds))
    return 0


if __name__ == "__main__":
    sys.exit(main())
