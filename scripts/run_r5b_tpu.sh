#!/bin/bash
# Round-5 session-2 TPU drive: the steps of run_r5_tpu.sh that never ran
# (7: device-only latency = VERDICT #6; 8: HRNet color-corpus seed 2;
# 9: crowd-TRAINED detchain), plus a bench.py warm so the driver's round-end
# bench starts from a hot compile cache.  /tmp was wiped -> cold cache;
# session probe measured ONE 610 s warmup compile then 0.5 s for the next
# program, so timeouts below are generous but each step is bounded.
# Run ALONE (1 CPU core -- no pytest during timed steps).
set -x
cd "$(dirname "$0")/.."

# 7) VERDICT #6 -- device-only serving latency per variant.
timeout 7200 python scripts/bench_latency_device.py

# 8) HRNet color-corpus seed 2 (n=2 spread for the family with the
#    +-0.06 val oscillation).  600 epochs matches the committed seed-11 run.
DISCRIM_MODEL=pose_hrnet:w32 DISCRIM_SEED=12 DISCRIM_EPOCHS=600 \
DISCRIM_OUT=DISCRIM_HRNET_s12.json \
    timeout 6000 python scripts/drive_discrim_ap.py

# 9) crowd-TRAINED detector-chain gate (eval-only result stays as
#    DISCRIM_DETCHAIN.json).
DETCHAIN_DIR=/root/repo/.detchain_train DETCHAIN_OUT=DISCRIM_DETCHAIN_TRAINED.json \
    timeout 6000 python scripts/drive_discrim_detchain.py

# warm the compile cache for the driver's round-end bench.
timeout 3600 python bench.py

echo "R5B CHAIN DONE"
