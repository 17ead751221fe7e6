#!/bin/bash
# Round-5 third queue: confirm + bound the large-batch discovery
# (r5b item 1: S2D bf16 bs8 NO remat = 21.35 img/s, +128% over bs1).
# Item 1 re-confirms on a fully idle box (r5b item 1's compile window
# briefly overlapped a duplicate bench launch); 2 probes bs16 no-remat;
# 3 checks one family generalization (S2D_df). (nd/semantic_trans bs8
# probes deferred — round-5 wall clock reserved for the cache re-warm +
# MM-affected test subset.)
cd /root/repo
L=${1:-/tmp/chip_queue_r5c.log}
PIDFILE=/tmp/chip_queue_r5b.pid
if [ -f "$PIDFILE" ]; then
  while kill -0 "$(cat $PIDFILE)" 2>/dev/null; do sleep 30; done
fi
echo $$ > /tmp/chip_queue_r5c.pid
run() { echo "--- $1 [$(date)] ---" >> $L; shift; timeout "$@" >> $L 2>&1; echo "rc=$? [$(date)]" >> $L; }
echo "=== r5c queue start $(date) ===" >> $L
run "1. S2D bf16 bs8 no-remat CONFIRM (r5b item 1: 21.35)" 2700 \
    python bench.py --model S2D --dtype bfloat16 --batch 8
run "2. S2D bf16 bs16 no-remat (OOM probe; rc!=0 acceptable)" 2700 \
    python bench.py --model S2D --dtype bfloat16 --batch 16
run "3. S2D_df bf16 bs8 (family: 17.18 at bs1)" 2700 \
    python bench.py --model S2D_df --dtype bfloat16 --batch 8
echo "=== r5c queue done $(date) ===" >> $L
rm -f /tmp/chip_queue_r5c.pid
