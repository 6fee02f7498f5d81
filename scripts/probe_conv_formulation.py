"""Probe: alternative formulations of tiny-spatial 3x3 convs on TPU.

PROBE_HRNET_BLOCK.json showed HRNet branch blocks running at 21-66% of
their shape-limited MXU ceilings: the deep branches (16x12x128, 8x6x256)
have C >= 128 (no lane-packing penalty) yet only reach ~40 TF/s -- the
cost is XLA's conv lowering on tiny spatial maps, not bytes or lanes.
ResNet50's bottleneck 3x3s at 16x12x256 / 8x6x512 have the same shape.

Candidate reformulations, all trainable (BN stays outside) and expressible
in pure XLA so jax.grad derives the backward:

  conv      lax.conv_general_dilated 3x3 SAME (baseline)
  shifted9  y = sum_{ky,kx} x_pad[:, ky:ky+H, kx:kx+W, :] @ W[ky,kx]
            (9 batched matmuls; slices may fuse into dot operands)
  im2col    concat the 9 shifted slices on channel -> one [BHW, 9C] @
            [9C, C] matmul (K = 9C keeps the MXU K-dim busy; costs 9x
            activation bytes if XLA materializes the concat)

Chained-fori_loop timing (one dispatch covers the loop) per docs/PERF.md's
tunnel-dispatch rule.  Numerics of each variant are checked against the
baseline conv in f32 before timing.

    python scripts/probe_conv_formulation.py [--iters 50]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def timed_chained(fn, x, *rest, iters=50):
    import jax

    @jax.jit
    def run(x, *rest):
        return jax.lax.fori_loop(0, iters, lambda i, acc: fn(acc, *rest), x)

    import jax.numpy as jnp

    out = run(x, *rest)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x, *rest)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    on_tpu = jax.default_backend() == "tpu"
    peak_tflops = 197.0  # v5e bf16

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def shifted9(x, w):
        b, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = None
        for ky in range(3):
            for kx in range(3):
                sl = jax.lax.slice(xp, (0, ky, kx, 0), (b, ky + h, kx + wd, c))
                part = jax.lax.dot_general(
                    sl, w[ky, kx], (((3,), (0,)), ((), ())))
                y = part if y is None else y + part
        return y

    def im2col(x, w):
        b, h, wd, c = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [jax.lax.slice(xp, (0, ky, kx, 0), (b, ky + h, kx + wd, c))
                for ky in range(3) for kx in range(3)]
        patches = jnp.concatenate(cols, axis=-1)  # [B,H,W,9C]
        return jax.lax.dot_general(
            patches, w.reshape(9 * c, -1), (((3,), (0,)), ((), ())))

    variants = {"conv": conv, "shifted9": shifted9, "im2col": im2col}

    # (label, B, H, W, C) -- HRNet branches at b256, ResNet50 3x3s at b128
    shapes = [
        ("hrnet_64x48x32", 256, 64, 48, 32),
        ("hrnet_32x24x64", 256, 32, 24, 64),
        ("hrnet_16x12x128", 256, 16, 12, 128),
        ("hrnet_8x6x256", 256, 8, 6, 256),
        ("resnet_16x12x256", 128, 16, 12, 256),
        ("resnet_8x6x512", 128, 8, 6, 512),
    ]
    if not on_tpu:
        shapes = [(lb, 4, h, w, c) for (lb, _, h, w, c) in shapes[:2]]

    rng = np.random.default_rng(0)
    results = []
    for label, b, h, wd, c in shapes:
        x32 = jnp.asarray(rng.standard_normal((b, h, wd, c)), jnp.float32)
        w32 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * (c * 9) ** -0.5,
                          jnp.float32)
        ref = np.asarray(conv(x32[:2], w32))
        x = x32.astype(jnp.bfloat16)
        w = w32.astype(jnp.bfloat16)
        flops = 2 * b * h * wd * c * c * 9
        row = {"shape": label, "batch": b}
        for name, fn in variants.items():
            got = np.asarray(fn(x32[:2], w32))
            err = float(np.max(np.abs(got - ref)))
            assert err < 1e-3 * max(1.0, float(np.max(np.abs(ref)))), (label, name, err)

            def step(xx, ww, f=fn):
                return f(xx, ww)

            def loss(xx, ww, f=fn):
                return jnp.sum(f(xx, ww)).astype(jnp.float32)

            fwdbwd = jax.grad(loss, argnums=(0,))
            t_f = timed_chained(step, x, w, iters=args.iters)
            t_fb = timed_chained(lambda xx, ww: fwdbwd(xx, ww)[0], x, w,
                                 iters=args.iters)
            row[name] = {
                "fwd_ms": round(t_f * 1e3, 3),
                "fwd_tflops": round(flops / t_f / 1e12, 1),
                "fwd_pct_peak": round(100 * flops / t_f / 1e12 / peak_tflops, 1),
                "fwdbwd_ms": round(t_fb * 1e3, 3),
            }
        results.append(row)
        print(json.dumps(row), flush=True)

    with open("PROBE_CONV_FORM.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "results": results}, f, indent=1)


if __name__ == "__main__":
    main()
