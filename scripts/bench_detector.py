"""Detector-only throughput: the device loop inside gen_detections
(eval.py gen-dets; reference gen_data_by_detector, eval.py:69-98 — the rest
of that workflow is host JSON bookkeeping).

    python scripts/bench_detector.py [--batch 32 --mesh --rect --quant w8a8]

One JSON line: images/s through YOLOv5Detector.predict_batch on pre-staged
synthetic canvases.  --mesh shards the batch axis over all devices (the
VERDICT-r3 gen-dets sharding row: on one chip this measures the sharded
path's overhead; on a slice it is the scale-out path).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--scale-name", default="l")
    ap.add_argument("--detector-family", default="yolov5")
    ap.add_argument("--mesh", action="store_true")
    ap.add_argument("--rect", action="store_true")
    ap.add_argument("--img-h", type=int, default=0,
                    help="source image height (width = canvas); 0 = square")
    ap.add_argument("--quant", default=None, choices=["w8a8"])
    ap.add_argument("--quant-calib", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.detector.wrapper import YOLOv5Detector

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch if on_tpu else 8
    canvas = 1280 if on_tpu else 128
    scale = args.scale_name if on_tpu else "s"
    iters = args.iters if on_tpu else 2

    mesh = None
    if args.mesh:
        from simple_pose_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    det = YOLOv5Detector(weights_path=None, scale_name=scale, canvas=canvas,
                         model_family=args.detector_family, amp="auto",
                         mesh=mesh, rect=args.rect, quant=args.quant)
    rng = np.random.default_rng(0)
    canvases = rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8)
    img_h = args.img_h or canvas
    shapes = [(img_h, canvas)] * b
    # pre-stage on device: over the tunnel, per-iter H2D of the uint8
    # canvases (157 MB at b=32) would measure the link, not the chip
    if mesh is not None:
        from simple_pose_tpu.parallel.mesh import batch_sharding

        canvases = jax.device_put(canvases, batch_sharding(mesh))
    else:
        canvases = jax.device_put(canvases)
    if args.quant_calib:
        det.calibrate(iter([(canvases, shapes)]), 1)

    det.predict_batch(canvases, shapes)  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = det.predict_batch(canvases, shapes)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "metric": f"detector_{args.detector_family}_{scale}"
                  + ("_sharded" if args.mesh else "")
                  + ("_rect" if args.rect else "")
                  + (f"_{args.quant}" if args.quant else "")
                  + ("_static" if args.quant_calib else ""),
        "value": round(b / dt, 2),
        "images_per_sec": round(b / dt, 2),
        "ms_per_batch": round(dt * 1000, 2),
        "batch": b, "n_boxes_img0": int(len(out[0])),
        "unit": "imgs/s",
    }))


if __name__ == "__main__":
    main()
