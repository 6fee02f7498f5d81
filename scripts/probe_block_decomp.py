"""Decompose the HRNet branch-block cost: convs vs BN/elementwise structure.

PROBE_CONV_FORM.json showed bare 3x3 convs at 61-81 TF/s (0.18-0.24 ms)
while PROBE_HRNET_BLOCK.json's full blocks cost 0.7-0.9 ms -- the gap is
the inter-conv structure, not the convs.  This probe times, per branch
shape (bf16, chained fori_loop, one dispatch):

  conv2x    conv(conv(x))                        -- pure conv chain
  affine    conv->scale*y+bias,relu->conv->+x,relu  -- inference-form block
  bnstats   same but with batch mean/var computed f32 like training BN
            (flax BatchNorm: reduce over (B,H,W), normalize, then relu)

The affine-conv2x delta prices the elementwise fusion boundaries; the
bnstats-affine delta prices the training-BN stat passes.  Whichever
dominates decides whether a fused conv+stats Pallas kernel could pay.

    python scripts/probe_block_decomp.py [--iters 300]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed_chained(fn, x, *rest, iters=300):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *rest):
        return jax.lax.fori_loop(0, iters, lambda i, acc: fn(acc, *rest), x)

    out = run(x, *rest)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x, *rest)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv2x(x, w1, w2, scale, bias):
        return conv(conv(x, w1), w2)

    def affine_block(x, w1, w2, scale, bias):
        y = conv(x, w1)
        y = jnp.maximum(y * scale + bias, 0)
        y = conv(y, w2)
        return jnp.maximum(y * scale + bias + x, 0)

    def bn_train(y, scale, bias):
        m = jnp.mean(y.astype(jnp.float32), axis=(0, 1, 2))
        v = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=(0, 1, 2)) - m * m
        inv = jax.lax.rsqrt(v + 1e-5) * scale.astype(jnp.float32)
        return (y.astype(jnp.float32) * inv + (bias.astype(jnp.float32) - m * inv)).astype(y.dtype)

    def bnstats_block(x, w1, w2, scale, bias):
        y = jnp.maximum(bn_train(conv(x, w1), scale, bias), 0)
        y = bn_train(conv(y, w2), scale, bias)
        return jnp.maximum(y + x, 0)

    variants = {"conv2x": conv2x, "affine": affine_block, "bnstats": bnstats_block}

    shapes = [
        ("64x48x32", 256, 64, 48, 32),
        ("32x24x64", 256, 32, 24, 64),
        ("16x12x128", 256, 16, 12, 128),
        ("8x6x256", 256, 8, 6, 256),
    ]
    if not on_tpu:
        shapes = [("64x48x32", 4, 64, 48, 32)]

    rng = np.random.default_rng(0)
    results = []
    for label, b, h, wd, c in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * (c * 9) ** -0.5, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * (c * 9) ** -0.5, jnp.bfloat16)
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)
        row = {"shape": label, "batch": b}
        for name, fn in variants.items():
            def loss(xx, *rest, f=fn):
                return jnp.sum(f(xx, *rest)).astype(jnp.float32)

            grad = jax.grad(loss, argnums=(0, 1, 2))
            t_f = timed_chained(fn, x, w1, w2, scale, bias, iters=args.iters)
            t_fb = timed_chained(lambda xx, *rest: grad(xx, *rest)[0], x, w1, w2,
                                 scale, bias, iters=args.iters)
            row[name] = {"fwd_ms": round(t_f * 1e3, 3), "fwdbwd_ms": round(t_fb * 1e3, 3)}
        results.append(row)
        print(json.dumps(row), flush=True)

    with open("PROBE_BLOCK_DECOMP.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
