"""Probe: the FLOP-scaling ceiling of banding the crop's stage-1 resample.

The two-stage MXU crop's stage 1 (ops/warp.py stage1_resample) contracts
the full 640-px canvas axes into the 328-px intermediate with 2-tap one-hot
interpolation matrices -- dense MXU matmuls whose rows are 2-sparse, so a
y/x-banded Pallas kernel (like the stage-2 x-band) could in principle drop
most of the contraction.  Any banded kernel is upper-bounded by simply
shrinking the contracted source extent, so this probe times stage-1 with
the canvas statically sliced to 640/512/384/256 px per axis: the measured
spread IS the ceiling on what banding can save, before paying lane
alignment (x-band starts must be 128-aligned -> real windows ~384 of 640)
and small-tile MXU underutilization.

Chained-fori_loop timing (iters >= 300; one dispatch covers the loop) per
docs/PERF.md's tunnel-dispatch rule; scalars vary per iteration through the
carry so no iteration can be CSE'd away.

    python scripts/probe_stage1_band.py [--iters 300 --batch 128]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.ops.warp import stage1_resample

    b, inter = args.batch, 328
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 255, (b, 640, 640, 3), dtype=np.uint8))
    # typical training decompositions: source box ~256-550 px on the canvas
    d = jnp.asarray(rng.uniform(0.8, 1.7, (b,)), jnp.float32)

    results = {}
    for src in (640, 512, 384, 256):
        img = canvas[:, :src, :src, :]
        # keep taps in range for the sliced source: scale/offset shrink with it
        d_s = d * (src / 640.0)
        t0 = jnp.zeros((b,), jnp.float32) + 1.0

        def step(carry, img=img, d_s=d_s, t0=t0):
            acc, i = carry
            tt = t0 + acc * 1e-30 + i.astype(jnp.float32) * 1e-3
            out = stage1_resample(img.astype(jnp.bfloat16), d_s, d_s, tt, tt, inter)
            return (jnp.sum(out[:, ::82, ::82, :]), i + 1)

        @jax.jit
        def run():
            return jax.lax.fori_loop(
                0, args.iters, lambda i, c: step(c), (jnp.zeros(()), jnp.zeros((), jnp.int32))
            )

        acc, _ = run()
        float(acc)
        t0_w = time.perf_counter()
        acc, _ = run()
        float(acc)
        ms = (time.perf_counter() - t0_w) / args.iters * 1000
        results[f"src_{src}"] = round(ms, 4)
        print(json.dumps({"src": src, "ms_per_iter": round(ms, 4)}), flush=True)

    results["batch"] = b
    results["iters"] = args.iters
    results["backend"] = jax.default_backend()
    with open("PROBE_STAGE1_BAND.json", "w") as f:
        json.dump(results, f)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
