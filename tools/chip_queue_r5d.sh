#!/bin/bash
# Round-5 final queue: complete the batch-8 working-point table
# (S2D +126%, S2D_base +126%, S2D_df +119% already measured).
cd /root/repo
L=${1:-/tmp/chip_queue_r5d.log}
echo $$ > /tmp/chip_queue_r5d.pid
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r5d queue start $(date) ===" >> $L
run "1. S2D_nd bf16 bs8 (family: 19.82 at bs1)" 2700 \
    python bench.py --model S2D_nd --dtype bfloat16 --batch 8
run "2. semantic_trans bf16 bs8 (family: 8.80 at bs1; OOM acceptable - GP grad-of-grad)" 2700 \
    python bench.py --model semantic_trans --dtype bfloat16 --batch 8
echo "=== r5d queue done $(date) ===" >> $L
rm -f /tmp/chip_queue_r5d.pid
