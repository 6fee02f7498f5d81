"""Benchmark a serving artifact against the live evaluator program.

Exports the PoseEvaluator step in-process (same config as bench_eval.py),
reloads it through jax.export deserialization, and times both on the same
pre-staged device batch -- proving the serving artifact dispatches at the
live program's rate (it is the same XLA program after recompile).

    python scripts/bench_export.py [--model-type ... --quant w8a8 --iters 10]

Prints one JSON line per variant (live / exported).
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
    ap.add_argument("--reduction", action="store_true")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--quant", default=None, choices=["w8a8"])
    ap.add_argument("--no-amp", action="store_true")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.export import export_evaluator, load_exported
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch if on_tpu else 4
    canvas = 640 if on_tpu else 128
    input_shape = (192, 256) if on_tpu else (64, 64)

    ev = PoseEvaluator(
        {"type": args.model_type, "name": args.model_name, "num_joints": 17,
         "reduction": args.reduction},
        None, input_shape, amp=False if args.no_amp else "auto",
        quant=args.quant)
    exported = load_exported(
        export_evaluator(ev, b, (canvas, canvas)).serialize())
    call = jax.jit(exported.call)

    rng = np.random.default_rng(0)
    s = canvas / max(input_shape)
    batch = jax.device_put({
        "canvas": rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (b, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (b, 1, 1)),
    })
    bargs = (batch["canvas"], batch["trans"], batch["trans_inv"])

    tag = f"{args.model_type}_{args.model_name}" + (f"_{args.quant}" if args.quant else "")
    for name, fn in (("live", lambda: ev(batch)), ("exported", lambda: call(*bargs))):
        out = fn()
        float(jnp.sum(out["kps"]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        float(jnp.sum(out["kps"]))
        dt = time.perf_counter() - t0
        print(json.dumps({"metric": f"export_bench_{tag}_{name}",
                          "value": round(b * args.iters / dt, 1),
                          "unit": "crops/s/chip"}))


if __name__ == "__main__":
    main()
