"""Assemble the round-4 TPU evidence artifacts after tpu_queue_r4.sh.

Reads the queue's /tmp logs, writes BENCH_r04_repro.json (the official
reproducible-tier bench captures, VERDICT round-3 item 6), and prints the
numbers that belong in PERF.md / RESULTS.md (giant-checkpoint timings,
cluster on-chip timings, gate outcomes) so the doc update is a paste, not
an archaeology dig. Host-only: safe to run with the tunnel down (it just
reports which logs are missing).

Run: python scripts/assemble_r4_evidence.py [--out BENCH_r04_repro.json]
"""

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BENCH_LOGS = {  # name -> what it captures
    "c8b": "bit1 chacha8b (conservative reproducible tier)",
    "c4b": "bit1 chacha4b (fastest qualified reproducible tier)",
    "pk8": "packed chacha8 (full-featured tier, u32 contract)",
    "hw": "bit1 hw (headline, no cross-backend contract)",
}


def last_json_line(path):
    if not os.path.exists(path):
        return None
    out = None
    with open(path) as f:
        for line in f:
            if line.startswith("{"):
                try:
                    out = json.loads(line)
                except json.JSONDecodeError:
                    pass
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "BENCH_r04_repro.json"))
    ap.add_argument("--logdir", default="/tmp")
    args = ap.parse_args(argv)

    missing = []
    captures = {}
    for name, desc in BENCH_LOGS.items():
        j = last_json_line(os.path.join(args.logdir, f"r4q_bench_{name}.log"))
        if j is None:
            missing.append(name)
        else:
            captures[name] = {"capture": desc, **j}

    if captures:
        with open(args.out, "w") as f:
            json.dump(captures, f, indent=1)
        print(f"wrote {args.out} ({len(captures)} captures)")
    if missing:
        print(f"MISSING bench logs: {missing} — queue incomplete?")

    status = os.path.join(args.logdir, "r4q_status.log")
    if os.path.exists(status):
        print("\n=== queue status ===")
        sys.stdout.write(open(status).read())

    for name, hint in (
            ("gate", "bit-exactness gate (default packed)"),
            ("gate_xla", "external-field gate"),
            ("gate_dense", "dense field gate"),
            ("hwstats", "hw statistical gate"),
            ("ckpt_scale", "34 G-spin checkpoint timings -> RESULTS.md"),
            ("cluster", "SW on-chip timings -> PERF.md 'Swendsen-Wang'")):
        p = os.path.join(args.logdir, f"r4q_{name}.log")
        if not os.path.exists(p):
            continue
        tail = open(p).read().strip().splitlines()[-6:]
        print(f"\n=== r4q_{name} ({hint}) tail ===")
        print("\n".join(tail))
    return 0 if not missing else 1


if __name__ == "__main__":
    raise SystemExit(main())
