#!/bin/bash
# Round-3 final chip queue — the r3c items not yet run (C-J minus A/B/G-pre),
# reordered by value for a short window. Each bench line appends to
# tools/bench_runs.jsonl manually after reading the log.
cd /root/repo
L=${1:-/tmp/chip_queue_r3d.log}
echo "=== r3d queue start $(date) ===" >> $L
echo "--- 1. S2D_df bf16 NEW code (old-code 16.73; fp32 new 16.23) ---" >> $L
timeout 2400 python bench.py --model S2D_df --dtype bfloat16 >> $L 2>&1
echo "--- 2. S2D_nd fp32 NEW code (old-code 13.88; bf16 new 19.82) ---" >> $L
timeout 2400 python bench.py --model S2D_nd --dtype float32 >> $L 2>&1
echo "--- 3. S2D bf16 + RESIZE_MM (vs 9.24 without) ---" >> $L
CDE_RESIZE_MM=1 timeout 3600 python bench.py --model S2D --dtype bfloat16 >> $L 2>&1
echo "--- 4. S2D fp32 NEW code (one-hot CE affects fp32 too; vs 6.51) ---" >> $L
timeout 3600 python bench.py --model S2D --dtype float32 --batch 2 >> $L 2>&1
echo "--- 5. semantic_trans bf16 NEW code (old-code 6.42) ---" >> $L
timeout 3600 python bench.py --model semantic_trans --dtype bfloat16 >> $L 2>&1
echo "--- 6. S2D_base bf16 NEW code (old-code 10.48) ---" >> $L
timeout 2400 python bench.py --model S2D_base --dtype bfloat16 >> $L 2>&1
echo "--- 7. re-profile S2D bf16 (after-trace for the attack story) ---" >> $L
timeout 2400 python -m tools.profile_top_ops --model S2D --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- 8. re-profile rf_lw bf16 (after-trace) ---" >> $L
timeout 2400 python -m tools.profile_top_ops --model rf_lw --dtype bfloat16 --batch 2 >> $L 2>&1
echo "=== r3d queue done $(date) ===" >> $L
