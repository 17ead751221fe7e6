#!/bin/bash
# Round-3 CPU work queue — run ONLY after the chip queue finishes
# (1-CPU box: concurrent CPU load taints chip timings, CLAUDE.md).
cd /root/repo
L=${1:-/tmp/cpu_queue.log}
echo "=== cpu queue start $(date) ===" >> $L
echo "--- 1. semantic_trans_full convergence horizon 12 -> 60 steps (VERDICT r2 item 9) ---" >> $L
timeout 7200 python -m tools.convergence_compare_st --steps 60 >> $L 2>&1
echo "--- 2. full new_multi S2D convergence horizon 12 -> 60 steps ---" >> $L
timeout 7200 python -m tools.convergence_compare_s2d_full --steps 60 >> $L 2>&1
echo "--- 3. regenerate mfu_report.json (ADVICE r2 low item) ---" >> $L
timeout 3600 python -m tools.mfu_report >> $L 2>&1
echo "=== cpu queue fully done $(date) ===" >> $L
