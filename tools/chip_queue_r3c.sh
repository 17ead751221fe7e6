#!/bin/bash
# Round-3 follow-up chip queue: A/B decomposition of the profiled-hot-spot
# attacks (one-hot CE + BN-in-compute-dtype landed e321706/68e098b; the
# same-day OLD-code controls are rf_lw bf16 17.159 (item 4a) and the
# round-2 S2D bf16 7.16). RESIZE_MM deltas ride on top of the new code.
cd /root/repo
L=${1:-/tmp/chip_queue_r3c.log}
echo "=== follow-up queue start $(date) ===" >> $L
echo "--- A. rf_lw bf16 NEW code, no RESIZE_MM (isolates CE+BN vs 17.159) ---" >> $L
timeout 2400 python bench.py --model rf_lw --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- B. S2D bf16 NEW code (vs round-2 7.16) ---" >> $L
timeout 3600 python bench.py --model S2D --dtype bfloat16 >> $L 2>&1
echo "--- C. S2D bf16 NEW code + RESIZE_MM ---" >> $L
CDE_RESIZE_MM=1 timeout 3600 python bench.py --model S2D --dtype bfloat16 >> $L 2>&1
echo "--- D. re-profile S2D bf16 (after-trace for the attack story) ---" >> $L
timeout 2400 python -m tools.profile_top_ops --model S2D --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- E. re-profile rf_lw bf16 (after-trace) ---" >> $L
CDE_RESIZE_MM=1 timeout 2400 python -m tools.profile_top_ops --model rf_lw --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- F. S2D fp32 re-measure (one-hot CE affects fp32 too; vs 6.51) ---" >> $L
timeout 3600 python bench.py --model S2D --dtype float32 --batch 2 >> $L 2>&1
echo "=== follow-up queue done $(date) ===" >> $L
echo "--- G. S2D_df bf16 re-run on NEW code (old-code 16.73) ---" >> $L
timeout 2400 python bench.py --model S2D_df --dtype bfloat16 >> $L 2>&1
echo "--- H. semantic_trans bf16 re-run on NEW code (old-code 6.42) ---" >> $L
timeout 3600 python bench.py --model semantic_trans --dtype bfloat16 >> $L 2>&1
echo "--- I. S2D_base bf16 re-run on NEW code (old-code 10.48) ---" >> $L
timeout 2400 python bench.py --model S2D_base --dtype bfloat16 >> $L 2>&1
echo "--- J. S2D_nd fp32 re-run on NEW code (old-code 13.88) ---" >> $L
timeout 2400 python bench.py --model S2D_nd --dtype float32 >> $L 2>&1
echo "=== follow-up queue (G-J) done $(date) ===" >> $L
