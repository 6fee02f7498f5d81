"""DEVICE-ONLY serving latency per variant (VERDICT r4 #6): the tunnel-RTT
p50 grid in BENCH_LATENCY.json is flat (~38 ms for every b1 variant) because
per-dispatch host sync dominates; the table a serving user needs is the
on-device program time per request, which dispatch cannot pollute.

Method: chained fori_loop — K iterations inside ONE dispatched program, the
carry injected into the (f32) transform input so XLA cannot hoist the body
(the probe_stage1_band.py idiom; >=300 iters amortizes everything host-side
to nothing).  device_ms = wall / iters.

    python scripts/bench_latency_device.py [--batches 1,8] [--iters 300]

Variants: live bf16, live w8a8-static (calibrated), exported bf16 artifact,
exported w8a8-static artifact (jax.export call re-traced inside the loop),
fused detect->pose bf16.  Writes BENCH_LATENCY_DEVICE.json; the tunnel p50
stays in BENCH_LATENCY.json as the labeled dispatch-inclusive column.

Reference deployment shape: per-image single_predict,
/root/reference/detector/yolov5_detector.py:217-239.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-type", default="pose_resnet_dconv")
    ap.add_argument("--model-name", default="resnet50")
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--variants", default="live,quant,export,export_quant,fused")
    args = ap.parse_args()

    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.export import export_evaluator, load_exported
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    on_tpu = jax.default_backend() == "tpu"
    canvas = 640 if on_tpu else 128
    input_shape = (192, 256) if on_tpu else (64, 64)
    model_cfg = {"type": args.model_type,
                 "name": args.model_name if on_tpu else "resnet18",
                 "num_joints": 17, "reduction": args.model_type != "pose_hrnet"}
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

    def chained_ms(step_of_trans, batch_trans, *ops, iters=iters):
        """step_of_trans(trans, *ops) -> scalar; carry-inject into trans, one
        dispatch for the whole loop, return ms/iter.  Every large operand
        (weights, canvases) MUST come in through *ops: jit arguments are
        traced parameters, while closed-over arrays are embedded as
        constants in the HLO — and the axon tunnel's remote_compile rejects
        request bodies that big (HTTP 413 on the fused program's ~190 MB of
        YOLOv5-l weights, 2026-08-21)."""

        @jax.jit
        def run(batch_trans, *ops):
            def body(i, acc):
                t = batch_trans + acc * 1e-30 + i.astype(jnp.float32) * 1e-6
                return step_of_trans(t, *ops) * 1e-12
            return jax.lax.fori_loop(0, iters, body, jnp.zeros(()))

        float(run(batch_trans, *ops))  # compile + warm
        t0 = time.perf_counter()
        float(run(batch_trans, *ops))
        ms = (time.perf_counter() - t0) / iters * 1e3
        return round(ms, 4)

    rows = []

    def emit(name, b, ms):
        row = {"metric": f"device_latency_{name}", "batch": b,
               "value": ms, "unit": "ms/request_device"}
        rows.append(row)
        print(json.dumps(row), flush=True)
        _write()  # incremental: a late-variant crash keeps the finished rows

    def _write():
        out = {"rows": rows, "iters": iters,
               "backend": "tpu" if on_tpu else "cpu",
               "note": "chained fori_loop, one dispatch per measurement; "
                       "value = ms per batched call on DEVICE (divide by "
                       "batch for ms/image).  Tunnel-inclusive p50 lives in "
                       "BENCH_LATENCY.json."}
        with open("BENCH_LATENCY_DEVICE.json", "w") as wf:
            json.dump(out, wf, indent=1)

    pose_variants = [v for v in variants if v != "fused"]
    if pose_variants:
        ev = PoseEvaluator(model_cfg, None, input_shape, amp="auto")
        ev_q = None
        if "quant" in variants or "export_quant" in variants:
            ev_q = PoseEvaluator(model_cfg, None, input_shape, amp="auto", quant="w8a8")
            ev_q.calibrate(iter([pose_batch(max(batches))]), 1)
        for b in batches:
            batch = jax.device_put(pose_batch(b))
            cv, tr, ti = batch["canvas"], batch["trans"], batch["trans_inv"]

            if "live" in variants:
                emit(f"{tag}_live_bf16", b, chained_ms(
                    lambda t, v, c, i: jnp.sum(ev._step(v, ev._layer1_folded,
                                                        {"canvas": c, "trans": t,
                                                         "trans_inv": i})["kps"]),
                    tr, ev.variables, cv, ti))
            if "quant" in variants:
                emit(f"{tag}_live_w8a8_static", b, chained_ms(
                    lambda t, v, c, i: jnp.sum(ev_q._step(v, ev_q._layer1_folded,
                                                          {"canvas": c, "trans": t,
                                                           "trans_inv": i})["kps"]),
                    tr, ev_q.variables, cv, ti))
            if "export" in variants:
                call = load_exported(
                    export_evaluator(ev, b, (canvas, canvas)).serialize()).call
                emit(f"{tag}_exported_bf16", b, chained_ms(
                    lambda t, c, i: jnp.sum(call(c, t, i)["kps"]), tr, cv, ti))
            if "export_quant" in variants:
                call_q = load_exported(
                    export_evaluator(ev_q, b, (canvas, canvas)).serialize()).call
                emit(f"{tag}_exported_w8a8_static", b, chained_ms(
                    lambda t, c, i: jnp.sum(call_q(c, t, i)["kps"]), tr, cv, ti))

    if "fused" in variants:
        from simple_pose_tpu.evalkit.fused import FusedDetectPose

        fcanvas = 1280 if on_tpu else 128
        det_size = (640, 640) if on_tpu else (64, 64)
        fused = FusedDetectPose(model_cfg, det_size=det_size, input_shape=input_shape,
                                max_people=16 if on_tpu else 4,
                                scale_name="l" if on_tpu else "s",
                                canvas=fcanvas, amp="auto")
        program = fused._program
        for b in batches:
            canvases = jnp.asarray(rng.integers(0, 255, (b, fcanvas, fcanvas, 3),
                                                dtype=np.uint8))
            lb = [jnp.asarray(x) for x in fused.host_prep([(fcanvas, fcanvas)] * b)]
            dvars = jax.device_put(fused.detector.variables)
            pvars = jax.device_put(fused.pose_vars)
            emit(f"fused_yolov5_{'l' if on_tpu else 's'}_{tag}_bf16", b, chained_ms(
                lambda t, dv, pv, c, *rest: jnp.sum(
                    program(dv, pv, c, t, *rest)["kps"]),
                lb[0], dvars, pvars, canvases, *lb[1:]))

    _write()
    print("wrote BENCH_LATENCY_DEVICE.json")


if __name__ == "__main__":
    main()
