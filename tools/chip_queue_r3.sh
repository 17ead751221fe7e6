#!/bin/bash
# Round-3 sequential chip measurement queue — run ONLY with the CPU
# otherwise idle (CLAUDE.md: the 1-CPU box taints timings under contention).
# Results are appended to tools/bench_runs.jsonl by hand from the log.
cd /root/repo
L=${1:-/tmp/chip_queue.log}
echo "=== chip queue start $(date) ===" >> $L
echo "--- 1. long_run_s2d 1000 steps bf16 bs2 (VERDICT r2 item 2) ---" >> $L
timeout 4200 python -m tools.long_run_s2d --steps 1000 --batch 2 --dtype bfloat16 >> $L 2>&1
echo "--- 2. profile S2D bf16 (VERDICT r2 item 3) ---" >> $L
timeout 2400 python -m tools.profile_top_ops --model S2D --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- 3. profile rf_lw bf16 ---" >> $L
timeout 2400 python -m tools.profile_top_ops --model rf_lw --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- 4a. rf_lw bf16 baseline bench ---" >> $L
timeout 2400 python bench.py --model rf_lw --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- 4b. rf_lw bf16 RESIZE_MM bench (A/B the MXU-matmul resize) ---" >> $L
CDE_RESIZE_MM=1 timeout 2400 python bench.py --model rf_lw --dtype bfloat16 --batch 2 >> $L 2>&1
echo "--- 4c. S2D bf16 baseline bench (same-day control for 4d) ---" >> $L
timeout 3600 python bench.py --model S2D --dtype bfloat16 >> $L 2>&1
echo "--- 4d. S2D bf16 RESIZE_MM bench (R_D ups + PSP priors ride the MXU) ---" >> $L
CDE_RESIZE_MM=1 timeout 3600 python bench.py --model S2D --dtype bfloat16 >> $L 2>&1
echo "--- 5. generator fast-serving resize_conv int8 (BASELINE.md lever) ---" >> $L
timeout 2400 python bench.py --up_mode resize_conv >> $L 2>&1
echo "--- 5b. generator baseline re-check ---" >> $L
timeout 2400 python bench.py >> $L 2>&1
echo "--- 6. S2D_nd bf16 clean re-run (ran with host contention) ---" >> $L
timeout 2400 python bench.py --model S2D_nd --dtype bfloat16 >> $L 2>&1
echo "--- 7. S2D_df fp32 clean re-run (ran with host contention) ---" >> $L
timeout 3600 python bench.py --model S2D_df --dtype float32 >> $L 2>&1
echo "--- 8. cycle_gan bs32 bf16 probe ---" >> $L
timeout 2400 python bench.py --model cycle_gan --batch 32 --dtype bfloat16 >> $L 2>&1
echo "=== chip queue fully done $(date) ===" >> $L
