"""Serving latency at request-sized batches (the number a serving user asks
for; reference deployment shape = per-image ``single_predict``,
/root/reference/detector/yolov5_detector.py:217-239).

    python scripts/bench_latency.py [--batches 1,8,32 --variants live,quant,export,fused]

For each (batch, variant) prints ONE JSON line with
  * ``p50_ms``/``p90_ms`` — per-call latency with a host sync after every
    dispatch.  In this dev environment that includes the axon tunnel RTT
    (~0.5 ms/dispatch, docs/PERF.md), so it is an upper bound on what a
    colocated server would see.
  * ``amortized_ms`` — K dispatches in flight, one sync: the pipelined
    per-request cost, which approximates the on-device program latency.

Variants: live bf16, live w8a8-static (calibrated), exported bf16 artifact,
exported w8a8-static artifact, fused detect->pose (batch = images).
"""

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(fn, sync, iters, warmup=5):
    for _ in range(warmup):
        sync(fn())
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn())
        ts.append(time.perf_counter() - t0)
    out = None
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(out)
    amortized = (time.perf_counter() - t0) / iters
    ts.sort()
    return {
        "p50_ms": round(statistics.median(ts) * 1e3, 3),
        "p90_ms": round(ts[int(0.9 * (len(ts) - 1))] * 1e3, 3),
        "amortized_ms": round(amortized * 1e3, 3),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-type", default="pose_resnet_dconv")
    ap.add_argument("--model-name", default="resnet50")
    ap.add_argument("--reduction", action="store_true", default=True)
    ap.add_argument("--batches", default="1,8,32")
    ap.add_argument("--variants", default="live,quant,export,export_quant,fused")
    ap.add_argument("--iters", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.export import export_evaluator, load_exported
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    on_tpu = jax.default_backend() == "tpu"
    canvas = 640 if on_tpu else 128
    input_shape = (192, 256) if on_tpu else (64, 64)
    model_cfg = {"type": args.model_type, "name": args.model_name if on_tpu else "resnet18",
                 "num_joints": 17, "reduction": args.reduction}
    batches = [int(x) for x in args.batches.split(",")]
    variants = args.variants.split(",")
    iters = args.iters if on_tpu else 3
    tag = f"{model_cfg['type']}_{model_cfg['name']}"

    rng = np.random.default_rng(0)
    s = canvas / max(input_shape)

    def pose_batch(b):
        return {
            "canvas": rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8),
            "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (b, 1, 1)),
            "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (b, 1, 1)),
        }

    def sync(out):
        float(jnp.sum(out["kps"]))

    rows = []
    pose_variants = [v for v in variants if v != "fused"]
    if pose_variants:
        ev = PoseEvaluator(model_cfg, None, input_shape, amp="auto")
        ev_q = None
        if "fusedl1" in variants:
            ev_l1 = PoseEvaluator(model_cfg, None, input_shape, amp="auto",
                                  fused_layer1=True)
        if "quant" in variants or "export_quant" in variants:
            ev_q = PoseEvaluator(model_cfg, None, input_shape, amp="auto", quant="w8a8")
            ev_q.calibrate(iter([pose_batch(max(batches))]), 1)
        for b in batches:
            batch = jax.device_put(pose_batch(b))
            bargs = (batch["canvas"], batch["trans"], batch["trans_inv"])
            per_variant = {}
            if "live" in variants:
                per_variant["live_bf16"] = lambda: ev(batch)
            if "quant" in variants:
                per_variant["live_w8a8_static"] = lambda: ev_q(batch)
            if "fusedl1" in variants:
                per_variant["live_fusedl1"] = lambda: ev_l1(batch)
            if "export" in variants:
                call = jax.jit(load_exported(
                    export_evaluator(ev, b, (canvas, canvas)).serialize()).call)
                per_variant["exported_bf16"] = lambda: call(*bargs)
            if "export_quant" in variants:
                call_q = jax.jit(load_exported(
                    export_evaluator(ev_q, b, (canvas, canvas)).serialize()).call)
                per_variant["exported_w8a8_static"] = lambda: call_q(*bargs)
            for name, fn in per_variant.items():
                row = {"metric": f"latency_{tag}_{name}", "batch": b,
                       "unit": "ms/request", **measure(fn, sync, iters)}
                rows.append(row)
                print(json.dumps(row), flush=True)

    if "fused" in variants:
        from simple_pose_tpu.evalkit.fused import FusedDetectPose

        fcanvas = 1280 if on_tpu else 128
        det_size = (640, 640) if on_tpu else (64, 64)
        mp = 16 if on_tpu else 4
        fused = FusedDetectPose(
            model_cfg, det_size=det_size, input_shape=input_shape,
            max_people=mp, scale_name="l" if on_tpu else "s",
            canvas=fcanvas, amp="auto")
        for b in batches:
            canvases = rng.integers(0, 255, (b, fcanvas, fcanvas, 3), dtype=np.uint8)
            shapes = [(fcanvas, fcanvas)] * b
            lb = fused.host_prep(shapes)
            dev_args = tuple(jax.device_put(a) for a in (
                fused.detector.variables, fused.pose_vars, jnp.asarray(canvases),
                *(jnp.asarray(x) for x in lb)))
            program = fused._program
            row = {"metric": f"latency_fused_yolov5_l_{tag}_bf16", "batch": b,
                   "unit": "ms/request",
                   **measure(lambda: program(*dev_args), sync, iters)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open("BENCH_LATENCY.json", "w") as wf:
        json.dump({"rows": rows, "iters": iters,
                   "note": "p50/p90 include per-dispatch host sync (tunnel RTT "
                           "in this env); amortized = pipelined dispatch"}, wf, indent=1)
    print("wrote BENCH_LATENCY.json")


if __name__ == "__main__":
    main()
