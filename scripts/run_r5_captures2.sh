#!/bin/bash
# Round-5 capture queue, part 2 (after run_r5_captures.sh): the grouped-LLM
# canonical bench (BENCH_r05 preview), streaming latency, and the real-dict
# homophone-cap quality knob. One TPU process at a time.
set -u
cd "$(dirname "$0")/.."

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name : $* (timeout ${tmo}s) $(date +%H:%M:%S) ==="
  timeout "$tmo" "$@" 2>&1 | tail -40
  # PIPESTATUS[0]: the command's status, not tail's (124 = timed out)
  echo "=== $name exit ${PIPESTATUS[0]} $(date +%H:%M:%S) ==="
}

# 1. canonical bench with GROUPED measured-in-run OPT finalize
run bench_canonical_grouped 5400 python bench.py

# 2. simulated online streaming decode (per-80ms-hop latency)
run bench_streaming 3600 python scripts/bench_streaming.py

# 3. real CMUdict with the homophone cap raised toward the class max
run bench_real_h10 4800 python bench.py --real_lexicon --max_homophones 10 --skip_llm

echo "ALL CAPTURES2 DONE $(date +%H:%M:%S)"
