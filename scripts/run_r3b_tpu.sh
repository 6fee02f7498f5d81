#!/bin/bash
# Round-3b TPU measurement batch: run once the axon tunnel is back.
# Sequential (1-core box: nothing else may run), logs to /tmp/r3b_*.log.
#   bash scripts/run_r3b_tpu.sh
set -x
cd "$(dirname "$0")/.."

# 1. int8 vs bf16 conv rates (+ the deployed w8a8 layer cost)
timeout 3000 python scripts/probe_int8_conv.py --iters 300 \
    > /tmp/r3b_probe_int8.log 2>&1

# 2. quantized eval throughput vs the recorded bf16 rows
#    (dynamic per-batch scales, then the fully static calibrated program)
timeout 3000 python scripts/bench_eval.py --model-name resnet50 --reduction \
    --batch 256 --quant w8a8 > /tmp/r3b_eval_dconv_q.log 2>&1
timeout 3000 python scripts/bench_eval.py --model-name resnet50 --reduction \
    --batch 256 --quant w8a8 --quant-calib > /tmp/r3b_eval_dconv_qs.log 2>&1
timeout 3000 python scripts/bench_eval.py --model-type pose_hrnet \
    --model-name w32 --batch 256 --quant w8a8 > /tmp/r3b_eval_hrnet_q.log 2>&1
timeout 3000 python scripts/bench_eval.py --model-type pose_hrnet \
    --model-name w32 --batch 256 --quant w8a8 --quant-calib \
    > /tmp/r3b_eval_hrnet_qs.log 2>&1

# 3. serving artifact dispatches at the live program's rate
timeout 3000 python scripts/bench_export.py --model-name resnet50 --reduction \
    > /tmp/r3b_export.log 2>&1

# 4. fused detect->pose: mod-64 rect bucket vs square on a wide image
#    (VERDICT #7 record), and the w8a8 fused program
timeout 3000 python scripts/bench_fused.py --img-h 480 --iters 30 \
    > /tmp/r3b_fused_sq.log 2>&1
timeout 3000 python scripts/bench_fused.py --img-h 480 --rect --iters 30 \
    > /tmp/r3b_fused_rect.log 2>&1
timeout 3000 python scripts/bench_fused.py --quant w8a8 --iters 30 \
    > /tmp/r3b_fused_q.log 2>&1

tail -n 2 /tmp/r3b_probe_int8.log /tmp/r3b_eval_dconv_q.log \
    /tmp/r3b_eval_dconv_qs.log /tmp/r3b_eval_hrnet_q.log \
    /tmp/r3b_eval_hrnet_qs.log /tmp/r3b_export.log /tmp/r3b_fused_sq.log \
    /tmp/r3b_fused_rect.log /tmp/r3b_fused_q.log
