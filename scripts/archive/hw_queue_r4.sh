#!/bin/bash
# Round-4 hardware measurement queue: serial TPU runs, one log.
# Usage: bash scripts/hw_queue_r4.sh   (run inside tmux; takes hours)
cd /root/repo
LOG=/tmp/hw_r4.log
run() {
  local name="$1"; shift
  echo "=== [$name] start $(date +%H:%M:%S)" >> "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "=== [$name] rc=$? end $(date +%H:%M:%S)" >> "$LOG"
}

run verify_b1      python scripts/verify_kernels.py 1
run bench_base     python bench.py
run bench_stem     env BFLOW_BENCH_STEM=1 python bench.py
run bench_conv     env BFLOW_BENCH_CONV=1 python bench.py
run bench_stemconv env BFLOW_BENCH_STEM=1 BFLOW_BENCH_CONV=1 python bench.py
run bench_fuse     env BFLOW_BENCH_FUSE=1 python bench.py
run bench_q8       env BFLOW_BENCH_LOOKUP=pallas_q8 python bench.py
run bench_q8fuse   env BFLOW_BENCH_LOOKUP=pallas_q8 BFLOW_BENCH_FUSE=1 python bench.py
run bench_onehot2  env BFLOW_BENCH_ONEHOT_LVL=2 python bench.py
run bench_onehot1  env BFLOW_BENCH_ONEHOT_LVL=1 python bench.py
run bench_all      env BFLOW_BENCH_STEM=1 BFLOW_BENCH_CONV=1 \
                       BFLOW_BENCH_LOOKUP=pallas_q8 BFLOW_BENCH_FUSE=1 python bench.py
echo "=== QUEUE DONE $(date +%H:%M:%S)" >> "$LOG"
