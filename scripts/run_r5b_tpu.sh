#!/bin/bash
# Round-5 chain, part 2: steps 3-9 of run_r5_tpu.sh (steps 1-2 completed
# 09:08-09:17; the first chain was killed mid-seed-12 to fix the epoch
# mismatch — seed runs must be 600 epochs to match DISCRIM_AP.json).
#     setsid nohup bash scripts/run_r5b_tpu.sh > /tmp/r5b_chain.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

DISCRIM_SEED=12 DISCRIM_EPOCHS=600 DISCRIM_OUT=DISCRIM_AP_s12.json \
    timeout 3000 python scripts/drive_discrim_ap.py
DISCRIM_SEED=13 DISCRIM_EPOCHS=600 DISCRIM_OUT=DISCRIM_AP_s13.json \
    timeout 3000 python scripts/drive_discrim_ap.py
timeout 300 python scripts/aggregate_discrim_seeds.py \
    DISCRIM_AP.json DISCRIM_AP_s12.json DISCRIM_AP_s13.json || true

timeout 3000 python scripts/bench_all.py --filter w48

PROF_LOGDIR=/tmp/sp_prof_q_hrnet PROF_MODEL=pose_hrnet:w32 PROF_QUANT=w8a8 \
PROF_QUANT_STATIC=1 \
    timeout 2400 python scripts/profile_xplane.py eval
PROF_LOGDIR=/tmp/sp_prof_q_hrnet PROF_SUMMARY_OUT=/tmp/quant_hrnet_summary.json \
    timeout 600 python scripts/profile_xplane.py summarize

timeout 4500 python scripts/bench_latency_device.py

DISCRIM_MODEL=pose_hrnet:w32 DISCRIM_SEED=12 DISCRIM_EPOCHS=600 \
DISCRIM_OUT=DISCRIM_HRNET_s12.json \
    timeout 4200 python scripts/drive_discrim_ap.py

DETCHAIN_DIR=/root/repo/.detchain_train DETCHAIN_OUT=DISCRIM_DETCHAIN_TRAINED.json \
    timeout 4200 python scripts/drive_discrim_detchain.py

echo "R5B CHAIN DONE"
