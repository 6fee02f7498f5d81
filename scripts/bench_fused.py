"""Benchmark the fused detect -> crop -> pose device program
(evalkit/fused.py: letterbox -> YOLOv5/v4 -> NMS -> multi-crop -> pose ->
GaussTaylor decode, ONE jitted program per image batch).

    python scripts/bench_fused.py [--batch 8 --max-people 16 --scale-name l]

Prints one JSON line: images/s and person-crops/s (batch * max_people pose
crops run per program, padded slots included -- that IS the device work).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-people", type=int, default=16)
    ap.add_argument("--scale-name", default="l")
    ap.add_argument("--detector-family", default="yolov5")
    ap.add_argument("--no-amp", action="store_true")
    ap.add_argument("--quant", default=None, choices=["w8a8"],
                    help="int8 quantized conv forward for both nets")
    ap.add_argument("--quant-calib", action="store_true",
                    help="calibrate static activation scales on the bench "
                         "batch first (the deployed fused program: no "
                         "dynamic max-reduces)")
    ap.add_argument("--rect", action="store_true",
                    help="minimum-rectangle bucket program (mod-64 static shapes)")
    ap.add_argument("--img-h", type=int, default=0,
                    help="source image height (width = canvas); 0 = square")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch if on_tpu else 2
    canvas = 1280 if on_tpu else 128
    det_size = (640, 640) if on_tpu else (64, 64)
    input_shape = (192, 256) if on_tpu else (64, 64)
    mp = args.max_people if on_tpu else 4
    scale = args.scale_name if on_tpu else "s"

    fused = FusedDetectPose(
        {"type": "pose_resnet_dconv", "name": "resnet50" if on_tpu else "resnet18",
         "num_joints": 17, "reduction": True},
        det_size=det_size, input_shape=input_shape, max_people=mp,
        scale_name=scale, canvas=canvas, detector_family=args.detector_family,
        amp=False if args.no_amp else "auto", rect=args.rect, quant=args.quant,
    )
    rng = np.random.default_rng(0)
    canvases = rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8)
    img_h = args.img_h or canvas
    shapes = [(img_h, canvas)] * b
    if args.quant_calib:
        fused.calibrate(iter([(canvases, shapes)]), 1)

    # pre-stage the program inputs once (tunnel-limited H2D in this dev env)
    bucket = ""
    if args.rect:
        th, tw = fused._pick_bucket(shapes)
        program = fused._program_for(th, tw)
        bucket = f"_rect{tw}x{th}"
        lb_trans, lb_region, lb_inv_scale, lb_offset = fused.host_prep(
            shapes, run_size=(tw, th))
    else:
        program = fused._program
        lb_trans, lb_region, lb_inv_scale, lb_offset = fused.host_prep(shapes)
    dev_args = tuple(jax.device_put(a) for a in (
        fused.detector.variables, fused.pose_vars, jnp.asarray(canvases),
        jnp.asarray(lb_trans), jnp.asarray(lb_region),
        jnp.asarray(lb_inv_scale), jnp.asarray(lb_offset)))

    out = program(*dev_args)
    float(jnp.sum(out["kps"]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = program(*dev_args)
    float(jnp.sum(out["kps"]))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": f"fused_detect_pose_{args.detector_family}_{scale}"
                  + ("_f32" if args.no_amp else "")
                  + (f"_{args.quant}" if args.quant else "")
                  + ("_static" if args.quant_calib else "") + bucket,
        "value": round(b / dt, 2),
        "images_per_sec": round(b / dt, 2),
        "pose_crops_per_sec": round(b * mp / dt, 1),
        "ms_per_batch": round(dt * 1000, 2),
        "unit": "imgs/s",
    }))


if __name__ == "__main__":
    main()
