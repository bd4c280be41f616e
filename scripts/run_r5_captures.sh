#!/bin/bash
# Round-5 TPU capture queue (docs/ROUND5.md §9) — run ONE at a time on the
# real chip (axon tunnel):  nohup bash scripts/run_r5_captures.sh > /tmp/r5caps.log 2>&1 &
# Each stage is individually time-bounded; a wedged tunnel fails one stage
# and moves on (bench.py additionally self-guards with bounded probes).
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name : $* (timeout ${tmo}s) $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" 2>&1 | tail -40
  # PIPESTATUS[0]: the command's status, not tail's (124 = timed out)
  echo "=== $name exit ${PIPESTATUS[0]} $(date +%H:%M:%S) ==="
}

# 1. canonical connected bench with measured OPT finalize (BENCH_r05 preview)
run bench_canonical 5400 python bench.py

# 2. honesty companions: adversarial + real-CMUdict worlds (LLM stage skipped
#    to bound wall-clock; the canonical run above carries the measured OPT)
run bench_adversarial 4200 python bench.py --adversarial --skip_llm
run bench_real_lexicon 4800 python bench.py --real_lexicon --skip_llm

# 3. device ngram-keying frontier probe (smaller K at matched quality?)
run bench_ngram_k32 3600 python bench.py --state_key ngram --beam_width 32 --skip_llm

# 4. the two outage-blocked round-4 measurements + the new lattice finalize
run bench_opt_full 5400 python scripts/bench_opt.py --full --context_words 48 --lattice

# 5. quality ladder at production scale (both backends + lattice column)
run quality_ladder 5400 python scripts/quality_ladder.py --utts 64 --device_batch 64 --gains 15,20,25,35,45 --lattice

# 6. training rate re-capture
run bench_training 3600 python scripts/bench_training.py

echo "ALL CAPTURES DONE $(date +%H:%M:%S)"
