#!/bin/bash
# Round-5 bench queue: run serially on a quiet host (post-pytest), engine
# tree frozen.  Order = evidentiary priority: north rule on the shipped
# tree first (COW + MoR), then the catch-up-at-scale ask (#3), then the
# changed-surface regression checks (router), then the 32M rerun.
set -x
cd /root/repo
export SCALING_TMPFS=/dev/shm/r5
export SCALING_TRIALS=2
export SCALING_INTERLEAVE=2
mkdir -p "$SCALING_TMPFS"

echo "=== queue start: $(date) load $(cat /proc/loadavg)" >> BENCH/r5_queue.log

python BENCH/scaling_run.py 16000000 --cpus 4,16 \
  --json BENCH/scaling_16m_c4_16_tmpfs_r5.json \
  >> BENCH/r5_queue.log 2>&1

SCALING_MODE=mor python BENCH/scaling_run.py 16000000 --cpus 4,16 \
  --json BENCH/scaling_16m_c4_16_tmpfs_mor_r5.json \
  >> BENCH/r5_queue.log 2>&1

python BENCH/consumer_scaling_run.py 64000000 --cpus 4,16 \
  --json BENCH/consumer_scaling_64m_c4_16_r5.json \
  >> BENCH/r5_queue.log 2>&1

python BENCH/route_scaling_run.py 8000000 --cpus 4,16 \
  --json BENCH/route_scaling_8m_r5.json \
  >> BENCH/r5_queue.log 2>&1

python BENCH/consumer_scaling_run.py 32000000 --cpus 4,16 \
  --json BENCH/consumer_scaling_32m_c4_16_r5.json \
  >> BENCH/r5_queue.log 2>&1

echo "=== queue end: $(date) load $(cat /proc/loadavg)" >> BENCH/r5_queue.log
