#!/bin/bash
# Round-4 chip queue, part c — post-attack remat/batch sweep for S2D.
# Motivation: the one-hot-CE/BN-dtype attack inverted the S2D optimum from
# bs2 to bs1 (8.31 vs 9.38 on 2026-08-20), which smells like HBM pressure
# at bs2; every remat row in README predates the attack. Re-measure the
# remat envelope on current code to see if a rematted larger batch beats
# bs1. Chains after chip_queue_r4b.sh.
cd /root/repo
L=${1:-/tmp/chip_queue_r4c.log}
PIDFILE=/tmp/chip_queue_r4b.pid
if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat $PIDFILE)" 2>/dev/null; do sleep 30; done
fi
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r4c queue start $(date) ===" >> $L
run "1. S2D bf16 bs2 + remat (pre-attack 5.8 fp32-only datum; bf16 bs2 no-remat = 8.31)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 2 --remat
run "2. S2D bf16 bs4 + remat (pre-attack 6.07; beats 9.38 bs1?)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 4 --remat
run "3. S2D bf16 bs8 + remat (OOM probe; rc!=0 acceptable)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 8 --remat
echo "=== r4c queue done $(date) ===" >> $L
