"""Secondary benchmark: eval-path throughput (crop -> forward -> GaussTaylor
decode), the AP-producing inference pipeline.

    python scripts/bench_eval.py [--model-type pose_hrnet --model-name w32]

Prints one JSON line per configuration.  (The driver-run benchmark is
bench.py at the repo root; this script is for perf work.)
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
    ap.add_argument("--flip-test", action="store_true")
    ap.add_argument("--no-amp", action="store_true", help="force float32 compute")
    ap.add_argument("--quant", default=None, choices=["w8a8"],
                    help="int8 quantized conv forward (models/quant.py)")
    ap.add_argument("--quant-calib", action="store_true",
                    help="calibrate static activation scales on the bench "
                         "batch first (measures the fully static deployed "
                         "program, no dynamic max-reduces)")
    ap.add_argument("--fused-layer1", action="store_true",
                    help="fold BN and run layer1 as one VMEM-resident Pallas "
                         "chain (ops/pallas_bottleneck)")
    # >=60 chained iters: the dev tunnel adds ~0.4-3 ms dispatch residue per
    # ev() call, which inflates short loops ~20% (docs/PERF.md round 4 --
    # the BENCH_ALL-vs-r4c eval-row delta); 10-iter loops are NOT trustworthy.
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--mesh", action="store_true",
                    help="run the sharded evaluator over a Mesh of all devices "
                         "(on one chip this measures the sharded path's overhead)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch if on_tpu else 4
    canvas = 640 if on_tpu else 128
    input_shape = (192, 256) if on_tpu else (64, 64)

    mesh = None
    if args.mesh:
        from simple_pose_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    ev = PoseEvaluator(
        {"type": args.model_type, "name": args.model_name, "num_joints": 17,
         "reduction": args.reduction},
        None, input_shape, flip_test=args.flip_test,
        amp=False if args.no_amp else "auto", mesh=mesh, quant=args.quant,
        fused_layer1=args.fused_layer1,
    )
    s = canvas / max(input_shape)
    # Generate the canvas batch ON DEVICE: content is irrelevant to the
    # timing (same shapes/dtypes), and host->device staging of the uint8
    # canvases (b256*640*640*3 = 314 MB) costs ~13 s/batch over the dev
    # tunnel (device_put measured at ~25 MB/s, 2026-08-20) — vs ~30 ms of
    # compute, so staging per iteration would dominate the whole bench.
    # The timed loop below is unchanged: device-resident inputs either way.
    batch = {
        "canvas": jax.jit(lambda k: jax.random.randint(
            k, (b, canvas, canvas, 3), 0, 255, "uint8"))(jax.random.key(0)),
        "trans": jax.device_put(np.tile(
            np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (b, 1, 1))),
        "trans_inv": jax.device_put(np.tile(
            np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (b, 1, 1))),
    }
    if args.quant_calib:
        ev.calibrate(iter([batch]), 1)
    out = ev(batch)
    float(jnp.sum(out["kps"]))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = ev(batch)
    float(jnp.sum(out["kps"]))
    dt = time.perf_counter() - t0
    per_chip = b * args.iters / dt / max(1, len(jax.devices()))
    print(json.dumps({
        "metric": f"eval_crops_per_sec_per_chip_{args.model_type}_{args.model_name}"
                  + ("_fliptest" if args.flip_test else "")
                  + ("_sharded" if args.mesh else "")
                  + (f"_{args.quant}" if args.quant else "")
                  + ("_static" if args.quant_calib else "")
                  + ("_fusedl1" if args.fused_layer1 else ""),
        "value": round(per_chip, 1),
        "unit": "crops/s/chip",
    }))


if __name__ == "__main__":
    main()
