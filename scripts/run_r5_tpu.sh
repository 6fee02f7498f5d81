#!/bin/bash
# Round-5 TPU drive: the remaining VERDICT r4 evidence items, serialized on
# the one chip, ordered by judged value per minute.  Each step is timeout-
# guarded so a wedged tunnel compile can't eat the chain (the 2026-08-20
# detchain hang: first compile never returned for 32 min).
#
# Run ALONE (no pytest contention — 1 CPU core) with the axon tunnel up:
#     setsid nohup bash scripts/run_r5_tpu.sh > /tmp/r5_chain.log 2>&1 &
#     echo $! > /tmp/r5_chain.pid
set -x
cd "$(dirname "$0")/.."

# 1) VERDICT #2 — detector-chain gate (detections json -> pose -> rescore ->
#    OKS-NMS -> COCOeval) on the crowded corpus, eval-only via the trained
#    flipsym checkpoint (~10 min; the crowd-trained retrain is step 9).
DETCHAIN_CKPT=.discrim_flip/weights/pose_resnet_dconv_last \
DETCHAIN_DIR=/root/repo/.detchain \
    timeout 2400 python scripts/drive_discrim_detchain.py

# 2) VERDICT #3 — per-op trace of the w8a8-static program (does the
#    dequant->BN->relu->requant f32 boundary hit HBM?), dconv-resnet50 b128
#    (the PERF.md Q2/Q3 shape).
PROF_LOGDIR=/tmp/sp_prof_q_dconv PROF_QUANT=w8a8 PROF_QUANT_STATIC=1 \
    timeout 2400 python scripts/profile_xplane.py eval
PROF_LOGDIR=/tmp/sp_prof_q_dconv PROF_SUMMARY_OUT=/tmp/quant_dconv_summary.json \
    timeout 600 python scripts/profile_xplane.py summarize

# 3+4) VERDICT #4 — error bar under the color-corpus discrim deltas:
#      two more dconv seeds.  DISCRIM_EPOCHS=600 matches the committed
#      seed-11 run (DISCRIM_AP.json epochs_run=600) — a 300-epoch seed
#      would conflate undertraining with seed noise.
DISCRIM_SEED=12 DISCRIM_EPOCHS=600 DISCRIM_OUT=DISCRIM_AP_s12.json \
    timeout 3000 python scripts/drive_discrim_ap.py
DISCRIM_SEED=13 DISCRIM_EPOCHS=600 DISCRIM_OUT=DISCRIM_AP_s13.json \
    timeout 3000 python scripts/drive_discrim_ap.py
timeout 300 python scripts/aggregate_discrim_seeds.py \
    DISCRIM_AP.json DISCRIM_AP_s12.json DISCRIM_AP_s13.json || true

# 5) VERDICT #5 — HRNet-W48 measured rows into BENCH_ALL.json
#    (train b128 + eval; oracle parity + config landed 35b6103).
timeout 3000 python scripts/bench_all.py --filter w48

# 6) VERDICT #3 — the HRNet half of the quant trace.
PROF_LOGDIR=/tmp/sp_prof_q_hrnet PROF_MODEL=pose_hrnet:w32 PROF_QUANT=w8a8 \
PROF_QUANT_STATIC=1 \
    timeout 2400 python scripts/profile_xplane.py eval
PROF_LOGDIR=/tmp/sp_prof_q_hrnet PROF_SUMMARY_OUT=/tmp/quant_hrnet_summary.json \
    timeout 600 python scripts/profile_xplane.py summarize

# 7) VERDICT #6 — device-only serving latency per variant (chained
#    fori_loop; tunnel p50 stays in BENCH_LATENCY.json as the labeled
#    dispatch-inclusive view).
timeout 4500 python scripts/bench_latency_device.py

# 8) stretch: a second color-corpus HRNet seed (n=2 spread for the family
#    with the +-0.06 val oscillation).
DISCRIM_MODEL=pose_hrnet:w32 DISCRIM_SEED=12 DISCRIM_EPOCHS=600 \
DISCRIM_OUT=DISCRIM_HRNET_s12.json \
    timeout 4200 python scripts/drive_discrim_ap.py

# 9) stretch: the crowd-TRAINED detector-chain gate (the eval-only step-1
#    result stays as DISCRIM_DETCHAIN.json unless this completes).
DETCHAIN_DIR=/root/repo/.detchain_train DETCHAIN_OUT=DISCRIM_DETCHAIN_TRAINED.json \
    timeout 4200 python scripts/drive_discrim_detchain.py

echo "R5 CHAIN DONE"
