#!/bin/bash
# Round-4a TPU measurement batch (VERDICT r3 #4/#5/#6/#7 hardware rows).
# Sequential (1-core box: nothing else may run), logs to /tmp/r4a_*.log.
#   nohup bash scripts/run_r4a_tpu.sh > /tmp/r4a_batch.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 1. fused detect->pose with STATIC w8a8 scales (the deployable quantized
#    fused program; the dynamic-scale row regressed)
timeout 3000 python scripts/bench_fused.py --quant w8a8 --quant-calib \
    --iters 30 > /tmp/r4a_fused_qs.log 2>&1

# 2. detector-only rows = the gen-dets device loop: plain vs sharded
#    (1-chip mesh measures the sharded path's overhead), rect bucket
timeout 3000 python scripts/bench_detector.py > /tmp/r4a_det.log 2>&1
timeout 3000 python scripts/bench_detector.py --mesh > /tmp/r4a_det_mesh.log 2>&1
timeout 3000 python scripts/bench_detector.py --rect --img-h 480 \
    > /tmp/r4a_det_rect.log 2>&1

# 3. serving latency grid: batch 1/8/32 x {live,quant,export,export_quant,fused}
timeout 7200 python scripts/bench_latency.py > /tmp/r4a_latency.log 2>&1

tail -n 3 /tmp/r4a_fused_qs.log /tmp/r4a_det.log /tmp/r4a_det_mesh.log \
    /tmp/r4a_det_rect.log /tmp/r4a_latency.log
