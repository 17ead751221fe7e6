#!/bin/bash
# Round-5 follow-up queue: chase the bs8+remat discovery (item 11 of r5:
# S2D bf16 bs8+remat = 15.47 img/s, +65% over the bs1 working point;
# step time went 505->518 ms from bs4->bs8 — near-free doubling).
# NOTE code drift inside the r5 queue: items 1-9 ran pre-prefer_mm code
# (gather resizes), items 10-11 post (S2D MM resizes on) — item 3 here
# decomposes the MM share of the bs8 number.
cd /root/repo
L=${1:-/tmp/chip_queue_r5b.log}
PIDFILE=/tmp/chip_queue_r5.pid
if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat $PIDFILE)" 2>/dev/null; do sleep 30; done
fi
echo $$ > /tmp/chip_queue_r5b.pid
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r5b queue start $(date) ===" >> $L
run "1. S2D bf16 bs8 NO remat (does it even fit post-attack? beats 15.47?)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 8
run "2. S2D bf16 bs16 + remat (keep scaling past 15.47?)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 16 --remat
run "3. S2D bf16 bs8 + remat, MM forced OFF (decompose MM vs batch effect)" 3600 \
    env CDE_RESIZE_MM=0 python bench.py --model S2D --dtype bfloat16 --batch 8 --remat
run "4. S2D_base bf16 bs8 (family check: does the batch-8 win generalize?)" 3600 \
    python bench.py --model S2D_base --dtype bfloat16 --batch 8
echo "=== r5b queue done $(date) ===" >> $L
rm -f /tmp/chip_queue_r5b.pid
