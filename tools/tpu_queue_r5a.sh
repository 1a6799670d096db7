#!/bin/sh
# Round-5 TPU validation queue at HEAD (one job at a time — the relay is
# exclusive; NOTES_TPU_ENV.md protocol). Run with:
#   nohup sh tools/tpu_queue_r5a.sh > /tmp/tpu_queue_r5a.log 2>&1 &
set -x
cd /root/repo
# 1. bench cold validation under a driver-like cap (VERDICT r4 #1 done
#    criterion: one parsed JSON line within the budget, never silence)
timeout 600 python bench.py > /tmp/r5a_bench600.log 2>&1
echo "bench600 rc=$?"
# 2. live-path A/B: one-call native horizon sim vs the round-4 per-slice
#    loop + chained quiet p50 (VERDICT r4 #2 target <= 0.9 ms/block)
timeout 2400 python tools/tpu_probe1_r5.py > /tmp/r5a_probe1.log 2>&1
echo "probe1 rc=$?"
# 3. event-storm soak at HEAD: baseline for VERDICT r4 #6 (slo_by_kind
#    says which dispatch path misses)
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r5a_storm.log 2>&1
echo "storm rc=$?"
# 4. a64 re-probe (standing instruction, 5th attempt)
timeout 1800 python tools/tpu_probe6_r3.py > /tmp/r5a_a64.log 2>&1
echo "a64 rc=$?"
echo QUEUE_DONE
