#!/bin/bash
# Round-5 chip queue. Run serially on an OTHERWISE-IDLE box (1-CPU host:
# concurrent compiles/tests contaminate dispatch — see bench_runs.jsonl
# 2026-08-19 S2D_df fp32 contamination row). Launch manually AFTER the CPU
# work (phase-split refactor tests + dryrun cache warm) is done.
#
# Items:
#   1-2: S2D_df root-cause pair (VERDICT r4 item 3) — same-day fp32 control
#        + bf16 re-measure of the anomalous 12.81 (old-code bf16 16.73,
#        same-code fp32 16.23, spread was 5.8% = largest of its day).
#   3-4: chunked-dense A/B on S2D (VERDICT r4 item 5: attack the 28%
#        copy+concatenate share named by tools/profile_diff_S2D_attack.txt)
#        — same-day control then CDE_DENSE_CHUNKED=1.
#   5-6: same A/B on S2D_base (second DenseNet datum).
#   7-8: RESIZE_MM second same-day pair (VERDICT r4 item 6; pair 1 was
#        9.376 control / 9.599 MM with overlapping spreads).
#   9-11: remat/batch envelope refresh on current code (VERDICT r4 item 7;
#        does a rematted larger batch beat bs1 = 9.38?). bs8 is an OOM
#        probe — rc!=0 acceptable.
#   12:  headline generator int8 (fresh dated row for round 5).
# Results booked to tools/bench_runs.jsonl manually from the log.
cd /root/repo
L=${1:-/tmp/chip_queue_r5.log}
echo $$ > /tmp/chip_queue_r5.pid
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r5 queue start $(date) ===" >> $L
run "1. S2D_df fp32 bs1 control (16.23 on 2026-08-19)" 3600 \
    python bench.py --model S2D_df --dtype float32 --batch 1
run "2. S2D_df bf16 bs1 re-measure (anomaly 12.81; old-code 16.73)" 3600 \
    python bench.py --model S2D_df --dtype bfloat16 --batch 1
run "3. S2D bf16 bs1 control (9.38 on 2026-08-20; post phase-split refactor)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 1
run "4. S2D bf16 bs1 CHUNKED dense (A/B vs item 3)" 3600 \
    env CDE_DENSE_CHUNKED=1 python bench.py --model S2D --dtype bfloat16 --batch 1
run "5. S2D_base bf16 bs1 control (11.50 on 2026-08-20)" 3600 \
    python bench.py --model S2D_base --dtype bfloat16 --batch 1
run "6. S2D_base bf16 bs1 CHUNKED dense (A/B vs item 5)" 3600 \
    env CDE_DENSE_CHUNKED=1 python bench.py --model S2D_base --dtype bfloat16 --batch 1
run "7. S2D bf16 bs1 control for RESIZE_MM pair 2 (pair 1: 9.376)" 2400 \
    python bench.py --model S2D --dtype bfloat16 --batch 1
run "8. S2D bf16 bs1 + RESIZE_MM (pair 2; pair 1: 9.599)" 2400 \
    env CDE_RESIZE_MM=1 python bench.py --model S2D --dtype bfloat16 --batch 1
run "9. S2D bf16 bs2 + remat (envelope; bf16 bs2 no-remat = 8.31)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 2 --remat
run "10. S2D bf16 bs4 + remat (pre-attack 6.07; beats 9.38 bs1?)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 4 --remat
run "11. S2D bf16 bs8 + remat (OOM probe; rc!=0 acceptable)" 3600 \
    python bench.py --model S2D --dtype bfloat16 --batch 8 --remat
run "12. headline generator int8 (r4 = 1404.2)" 2400 \
    python bench.py
echo "=== r5 queue done $(date) ===" >> $L
rm -f /tmp/chip_queue_r5.pid
