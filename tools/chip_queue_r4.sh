#!/bin/bash
# Round-4 chip queue — flush the r3d backlog (VERDICT r4 item 2) with the
# ADVICE fixes applied: --batch EXPLICIT on every line, plus the S2D bf16
# --batch 2 re-measure that resolves the bs1-vs-bs2 A/B confound
# (ADVICE r3, medium). bench.py now reports median-of-3 blocks + spread
# (VERDICT item 5), so every row below carries its own noise annotation.
# Results are appended to tools/bench_runs.jsonl manually from the log.
cd /root/repo
L=${1:-/tmp/chip_queue_r4.log}
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r4 queue start $(date) ===" >> $L
# 1. headline (driver metric) same-day control with spread
run "1. headline generator int8 (driver metric; r3=1394.8, r2=1409.9)" 1800 python bench.py
# 2. the ADVICE-medium resolver: S2D bf16 bs2 on NEW code (pre-attack bs2 was 7.16)
run "2. S2D bf16 --batch 2 NEW code (bs1 new=9.24; bs2 old=7.16)" 3600 python bench.py --model S2D --dtype bfloat16 --batch 2
# 3+4. S2D bf16 bs1 same-day control, then RESIZE_MM A/B on top
run "3. S2D bf16 --batch 1 control (r3c measured 9.236)" 2400 python bench.py --model S2D --dtype bfloat16 --batch 1
run "4. S2D bf16 --batch 1 + RESIZE_MM (A/B vs item 3)" 2400 env CDE_RESIZE_MM=1 python bench.py --model S2D --dtype bfloat16 --batch 1
# 5. S2D fp32 bs2 NEW code (one-hot CE affects fp32 too; old 6.51)
run "5. S2D fp32 --batch 2 NEW code (old 6.51)" 3600 python bench.py --model S2D --dtype float32 --batch 2
# 6-9. family re-measures on current code
run "6. semantic_trans bf16 --batch 1 NEW code (old 6.42)" 3600 python bench.py --model semantic_trans --dtype bfloat16 --batch 1
run "7. S2D_base bf16 --batch 1 NEW code (old 10.48)" 2400 python bench.py --model S2D_base --dtype bfloat16 --batch 1
run "8. S2D_df bf16 --batch 1 NEW code (old-code 16.73; fp32 new 16.23)" 2400 python bench.py --model S2D_df --dtype bfloat16 --batch 1
run "9. S2D_nd fp32 --batch 1 NEW code (old-code 13.88; bf16 new 19.82)" 2400 python bench.py --model S2D_nd --dtype float32 --batch 1
# 10-11. after-traces for the CE/BN attack story (VERDICT item 4)
run "10. after-trace S2D bf16 --batch 2" 2400 python -m tools.profile_top_ops --model S2D --dtype bfloat16 --batch 2
run "11. after-trace rf_lw bf16 --batch 2" 2400 python -m tools.profile_top_ops --model rf_lw --dtype bfloat16 --batch 2
echo "=== r4 queue done $(date) ===" >> $L
