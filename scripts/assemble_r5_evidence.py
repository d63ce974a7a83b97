"""Assemble the round-5 official bench artifact from the /tmp capture logs.

Reads the round-5 bench logs (one JSON line each, written by the queued
`bench.py` invocations) and writes BENCH_r05_repro.json — the official
per-tier captures: the three reproducible chacha tiers, philox7b, the
full-featured packed tier under both its reproducible and hw modes
(VERDICT r4 item 5), and the bit1/hw headline. Host-only.

Run: python scripts/assemble_r5_evidence.py [--out BENCH_r05_repro.json]
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BENCH_LOGS = {  # name -> what it captures
    "c4b": "bit1 chacha4b (fastest qualified reproducible tier)",
    "c6b": "bit1 chacha6b (qualified-with-margin reproducible tier)",
    "c8b": "bit1 chacha8b (conservative reproducible tier)",
    "p7b": "bit1 philox7b (BigCrush-validated reproducible tier)",
    "pk8": "packed chacha8 (full-featured tier, u32 contract)",
    "pkhw": "packed hw (full-featured tier headline, no contract)",
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
                                                  "BENCH_r05_repro.json"))
    ap.add_argument("--logdir", default="/tmp")
    args = ap.parse_args(argv)

    missing = []
    captures = {}
    for name, desc in BENCH_LOGS.items():
        j = last_json_line(os.path.join(args.logdir,
                                        f"r5q_bench_{name}.log"))
        if j is None:
            missing.append(name)
        else:
            captures[name] = {"capture": desc, **j}

    if captures:
        with open(args.out, "w") as f:
            json.dump(captures, f, indent=1)
        print(f"wrote {args.out} ({len(captures)} captures)")
    for name, c in captures.items():
        print(f"  {name:5s} {c['value']:8.1f} flips/ns "
              f"({c['vs_baseline']:.3f}x baseline)")
    if missing:
        print(f"MISSING bench logs: {missing} — queue incomplete?")
    return 0 if not missing else 1


if __name__ == "__main__":
    raise SystemExit(main())
