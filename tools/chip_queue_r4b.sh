#!/bin/bash
# Round-4 chip queue, part b — chains after chip_queue_r4.sh (waits on its
# pid). Contents:
#   1. the structured-band 1,000-step S2D run (VERDICT r3 item 3: show the
#      band term DECREASING when targets come through the real KITTI band
#      encoding instead of sign(randn) coin flips) — also the on-chip drive
#      of the new dep_l1/dep_band metric split in models/s2d.py
#   2+3. second same-day RESIZE_MM A/B pair on S2D bf16 bs1 (first pair:
#      control 9.376 sp2.0 vs MM 9.599 sp4.0 — overlapping spreads)
# Results booked to tools/bench_runs.jsonl manually from the log.
cd /root/repo
L=${1:-/tmp/chip_queue_r4b.log}
PIDFILE=/tmp/chip_queue_r4.pid
if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat $PIDFILE)" 2>/dev/null; do sleep 30; done
fi
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r4b queue start $(date) ===" >> $L
# 0. CPU validation of the dep_l1/dep_band metric split BEFORE it drives
#    the chip run (serial here, so no bench contention)
run "0. test_s2d_train_step (dep_l1/dep_band split, CPU)" 1800 \
    python -m pytest tests/test_s2d.py::test_s2d_train_step -x -q
run "1. structured-band 1000-step S2D bf16 bs2 long run" 5400 \
    python -m tools.long_run_s2d --structured_bands --steps 1000 --batch 2 \
    --out tools/long_run_s2d_structured.json
run "2. S2D bf16 --batch 1 control (pair 2; pair 1 = 9.376)" 2400 \
    python bench.py --model S2D --dtype bfloat16 --batch 1
run "3. S2D bf16 --batch 1 + RESIZE_MM (pair 2; pair 1 = 9.599)" 2400 \
    env CDE_RESIZE_MM=1 python bench.py --model S2D --dtype bfloat16 --batch 1
echo "=== r4b queue done $(date) ===" >> $L
