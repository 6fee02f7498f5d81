"""Probe: int8 conv throughput on the v5e MXU vs bf16.

The v5e MXU rates int8 at 394 TOPS vs 197 bf16 TFLOPS.  If XLA lowers
int8 `conv_general_dilated` (s8 x s8 -> s32) onto that path, a quantized
eval/serving mode (per-channel weight quant + activation requant) could
approach 2x the bf16 eval throughput on the conv-bound models.  This probe
answers the prerequisite question: what do int8 convs actually run at, per
representative ResNet50 shape, including the inter-layer requantize
(right-shift + saturate cast) a real quantized net pays?

Chained-fori_loop timing (one dispatch covers the loop; iters >= 300 per
docs/PERF.md's tunnel-dispatch rule).  Run alone -- nothing else on the box.

    python scripts/probe_int8_conv.py [--iters 300]

Writes PROBE_INT8_CONV.json.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--out", default="PROBE_INT8_CONV.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    def conv(x, w, preferred):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred)

    def timed(fn, x, w, iters):
        @jax.jit
        def run(x, w):
            return jax.lax.fori_loop(0, iters, lambda i, acc: fn(acc, w), x)

        out = run(x, w)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        out = run(x, w)
        float(jnp.sum(out.astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    def bf16_layer(x, w):
        return conv(x, w, jnp.float32).astype(jnp.bfloat16)

    def int8_layer(x, w):
        y = conv(x, w, jnp.int32)
        # inter-layer requantize: scale-free right shift + saturating cast
        return jnp.clip(y >> 7, -128, 127).astype(jnp.int8)

    def w8a8_layer(x, w8):
        # the models/quant.py path as deployed: bf16 float intermediates,
        # dynamic per-tensor act scale, int8 conv, float dequant.  This is
        # the per-layer cost the quantized evaluator actually pays (weight
        # quantization is constant-folded, so w8 is pre-quantized here).
        xf = x.astype(jnp.float32)
        s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
        x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        y = conv(x8, w8, jnp.int32)
        return (y.astype(jnp.float32) * (s_x / 64.0)).astype(jnp.bfloat16)

    def w8a8_static_layer(x, w8):
        # calibrated-scale variant (quant.calibrate_w8a8): s_x is a
        # compile-time constant, so the dynamic max-reduce disappears --
        # this row isolates what that reduce costs per shape
        xf = x.astype(jnp.float32)
        x8 = jnp.clip(jnp.round(xf / 0.05), -127, 127).astype(jnp.int8)
        y = conv(x8, w8, jnp.int32)
        return (y.astype(jnp.float32) * (0.05 / 64.0)).astype(jnp.bfloat16)

    def folded_layer(x8, w8, scale, bias):
        # the folded-graph END STATE (int8 activations BETWEEN layers):
        # int8 in -> int32 conv -> per-channel scale+bias (BN + dequant
        # folded) -> relu -> requant to the next layer's static scale -> int8
        # out.  Per-layer cost if quantization were graph-level instead of
        # the per-conv interceptor; compare against w8a8_* to decide whether
        # that larger rewrite buys anything (activations 1B vs 2B in HBM).
        y = conv(x8, w8, jnp.int32)
        z = jnp.maximum(y.astype(jnp.float32) * scale + bias, 0.0)
        return jnp.clip(jnp.round(z * 8.0), -127, 127).astype(jnp.int8)

    shapes = [
        (128, 64, 48, 64),
        (128, 32, 24, 128),
        (128, 16, 12, 256),
        (128, 8, 6, 512),
    ]
    if os.environ.get("PROBE_SMALL"):  # CPU smoke: lowering check only
        shapes = [(2, 8, 8, 16)]
    rng = np.random.default_rng(0)
    rows = []
    for (b, h, w_, c) in shapes:
        flops = 2 * b * h * w_ * c * c * 9
        xa = rng.integers(-4, 4, (b, h, w_, c))
        wa = rng.integers(-4, 4, (3, 3, c, c))
        x8 = jax.device_put(xa.astype(np.int8))
        w8 = jax.device_put(wa.astype(np.int8))
        xb = jax.device_put(xa.astype(jnp.bfloat16))
        wb = jax.device_put((wa / 64.0).astype(jnp.bfloat16))

        t_bf = timed(bf16_layer, xb, wb, args.iters)
        row = {"shape": [b, h, w_, c], "bf16_ms": t_bf * 1e3,
               "bf16_tflops": flops / t_bf / 1e12}
        try:
            t_i8 = timed(int8_layer, x8, w8, args.iters)
            row.update({"int8_ms": t_i8 * 1e3,
                        "int8_tops": flops / t_i8 / 1e12,
                        "speedup": t_bf / t_i8})
            t_l = timed(w8a8_layer, xb, w8, args.iters)
            row.update({"w8a8_layer_ms": t_l * 1e3,
                        "w8a8_layer_speedup": t_bf / t_l})
            t_s = timed(w8a8_static_layer, xb, w8, args.iters)
            row.update({"w8a8_static_ms": t_s * 1e3,
                        "w8a8_static_speedup": t_bf / t_s})
            scale = jax.device_put((rng.uniform(0.001, 0.02, (c,))).astype(np.float32))
            bias = jax.device_put((rng.uniform(-0.5, 0.5, (c,))).astype(np.float32))
            t_f = timed(lambda a, ww: folded_layer(a, ww, scale, bias), x8, w8,
                        args.iters)
            row.update({"folded_ms": t_f * 1e3,
                        "folded_speedup": t_bf / t_f})
        except Exception as e:  # lowering unsupported -> record it
            row["int8_error"] = f"{type(e).__name__}: {str(e)[:300]}"
        rows.append(row)
        print(json.dumps(row), flush=True)

    result = {"backend": jax.default_backend(), "iters": args.iters,
              "rows": rows}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
