#!/bin/bash
# Round-4c TPU drive: land the fused layer1 Pallas chain end-to-end.
# Run ALONE (no pytest contention) with the axon tunnel up:
#     nohup bash scripts/run_r4c_tpu.sh > /tmp/r4c_tpu.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 1) eval throughput: fused vs plain, HRNet-W32 b256 and dconv-resnet50 b128
python scripts/bench_eval.py --model-type pose_hrnet --model-name w32 \
    --batch 256 --iters 60
python scripts/bench_eval.py --model-type pose_hrnet --model-name w32 \
    --batch 256 --iters 60 --fused-layer1
python scripts/bench_eval.py --model-type pose_resnet_dconv --model-name resnet50 \
    --reduction --batch 128 --iters 100
python scripts/bench_eval.py --model-type pose_resnet_dconv --model-name resnet50 \
    --reduction --batch 128 --iters 100 --fused-layer1

# 2) discriminative AP: fused layer1 vs float.  The round-4b HRNet run dir
# was wiped with /tmp; retrain (~37 min chip) with DISCRIM_DIR persistence --
# the refreshed DISCRIM_HRNET.json now includes the fused_layer1 variant row.
DISCRIM_MODEL=pose_hrnet:w32 DISCRIM_OUT=DISCRIM_HRNET.json \
    DISCRIM_EPOCHS=600 DISCRIM_DIR=/root/repo/.discrim/hrnet_r4c \
    python scripts/drive_discrim_ap.py
