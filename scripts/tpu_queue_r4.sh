#!/bin/bash
# Round-4 TPU work queue: run once when the axon tunnel is back.
# ONE TPU process at a time; everything logged under /tmp/r4q_*.log.
set -u
cd /root/repo
q() {  # q <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4q_status.log
  timeout "$t" "$@" > "/tmp/r4q_$name.log" 2>&1
  local rc=$?
  echo "=== $name exit=$rc $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4q_status.log
  return $rc
}

# 1. Bit-exactness gate (kernel + rng changes this round)
q gate 3600 python -u scripts/verify_tpu.py || exit 1
# 1b. external-field gates (new in round 4: xla full-table select;
# dense already indexes all 10 classes)
q gate_xla 1800 python -u scripts/verify_tpu.py --backend xla || exit 1
q gate_dense 1800 python -u scripts/verify_tpu.py --backend dense || exit 1
# 2. hw-mode statistical gate (hw key derivation changed: a313ad4)
q hwstats 1200 python -u scripts/verify_hw_stats.py || exit 1
# 3. Official reproducible-tier bench captures (VERDICT item 6)
q bench_c8b 3600 python -u bench.py --rng chacha8b
q bench_c4b 3600 python -u bench.py --rng chacha4b
q bench_pk8 3600 python -u bench.py --rng chacha8 --backend packed
# 4. Re-warm the default headline program for the driver's BENCH capture
q bench_hw 3600 python -u bench.py
# Collect the JSON lines for the repro artifact (one line per capture)
: > /tmp/r4q_repro.jsonl
for n in c8b c4b pk8 hw; do
  grep -h '^{' "/tmp/r4q_bench_$n.log" | tail -1 >> /tmp/r4q_repro.jsonl
done
# 5. Storage-domain checkpoint speedup evidence (RESULTS.md update)
q ckpt_scale 5400 python -u scripts/verify_ckpt_scale.py
# 6. Swendsen-Wang on-chip timing + label-contraction variant choice
q cluster 3600 python -u scripts/experiments/bench_cluster.py
echo "=== QUEUE DONE $(date -u +%H:%M:%S) ===" | tee -a /tmp/r4q_status.log
