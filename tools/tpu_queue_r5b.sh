#!/bin/sh
# Round-5 TPU queue #2 at HEAD (worker-side spec build) — one job at a
# time (the relay is exclusive; NOTES_TPU_ENV.md protocol). Run with:
#   nohup sh tools/tpu_queue_r5b.sh > /tmp/tpu_queue_r5b.log 2>&1 &
set -x
cd /root/repo
# 1. chained quiet at HEAD: spec block should collapse ~3.9 -> ~0.1 ms,
#    end-to-end toward the VERDICT r4 #2 target (<= 0.9 ms/block)
timeout 2400 python tools/tpu_probe3_r5.py > /tmp/r5b_probe3.log 2>&1
echo "probe3 rc=$?"
# 2. bench cold validation at the shipped default budget, under a cap
#    comfortably above it (the driver's own cap is >= 20 min: BENCH_r01-
#    r03 all ran 10-15+ min and parsed)
timeout 1500 python bench.py > /tmp/r5b_bench.log 2>&1
echo "bench rc=$?"
# 3. event-storm soak re-run (the 08:20 run was poisoned by a ~370 s
#    relay stall): VERDICT r4 #6 target <= 0.05% with slo_by_kind
timeout 2700 env SOAK_MINUTES=10 SOAK_EVENT_SECONDS=0.1 \
    python tools/tpu_soak_r3.py > /tmp/r5b_storm.log 2>&1
echo "storm rc=$?"
echo QUEUE_DONE
