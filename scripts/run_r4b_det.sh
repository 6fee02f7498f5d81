#!/bin/bash
# Re-measure detector-only rows with pre-staged inputs (the r4a rows were
# tunnel-dominated).  Sequential; logs to /tmp/r4b_det*.log.
set -x
cd "$(dirname "$0")/.."
timeout 3000 python scripts/bench_detector.py --iters 40 > /tmp/r4b_det.log 2>&1
timeout 3000 python scripts/bench_detector.py --mesh --iters 40 > /tmp/r4b_det_mesh.log 2>&1
timeout 3000 python scripts/bench_detector.py --rect --img-h 480 --iters 40 > /tmp/r4b_det_rect.log 2>&1
timeout 3000 python scripts/bench_detector.py --quant w8a8 --quant-calib --iters 40 > /tmp/r4b_det_qs.log 2>&1
tail -n 1 /tmp/r4b_det.log /tmp/r4b_det_mesh.log /tmp/r4b_det_rect.log /tmp/r4b_det_qs.log
