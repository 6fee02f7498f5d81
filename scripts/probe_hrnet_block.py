"""HRNet byte-reduction probe (round 3).

CAVEAT (superseded numbers): the default --iters 50 leaves ~0.45 ms/iter
of tunnel-dispatch residue, which reads as a size-independent per-block
constant.  Use --iters >= 300, and prefer scripts/probe_block_decomp.py /
PROBE_BLOCK_DECOMP.json for the corrected per-block costs (docs/PERF.md
"three rounds, one correction").

The HRNet-W32 step is memory-roofline-bound (docs/PERF.md xprof: branch
residual blocks = 70% of step time at 600-780 GB/s of the ~819 GB/s v5e
peak).  Before building a fused Pallas residual block, measure how much
headroom actually exists:

  * time each branch's basic block (two 3x3 convs + folded BN + relu +
    skip) forward and forward+backward in isolation at batch 256,
  * compare against the HBM byte floor (activations read+write per conv;
    weights are negligible) -> achieved fraction of roofline,
  * time the fuse chain (1x1 conv + nearest-upsample + add) against ITS
    byte floor.

If XLA already sits near the floor, a Pallas fused block can only win by
deleting the intermediate round-trip (bounded below), and at C=32 the MXU
runs at ~1/4-1/16 lane utilization in a hand-written kernel, so the bound
must be large to be worth it.  Prints one JSON line per measurement.

    python scripts/probe_hrnet_block.py [--batch 256]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

HBM_PEAK_GBS = 819.0  # v5e


def timed_chained(fn, x, *rest, iters=50):
    """Time ``iters`` applications CHAINED INSIDE one jitted fori_loop: a
    single dispatch covers the whole loop, so tunnel dispatch latency (which
    inflates isolated small programs ~5x here, docs/PERF.md) cancels out."""
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch if on_tpu else 4
    branches = [(64, 48, 32), (32, 24, 64), (16, 12, 128), (8, 6, 256)]
    rng = np.random.default_rng(0)
    results = []

    for h, w, c in branches:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32)).astype(jnp.bfloat16)
        k1 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        k2 = jnp.asarray(rng.normal(size=(3, 3, c, c)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)

        def block(x, k1, k2, scale, bias):
            # bf16 in/out (XLA accumulates conv partials in f32 internally);
            # no preferred_element_type so the transpose rule keeps dtypes
            # uniform in the backward convs
            y = jax.lax.conv_general_dilated(
                x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = jnp.maximum(y * scale + bias, 0)
            y = jax.lax.conv_general_dilated(
                y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.maximum(y * scale + bias + x, 0)

        def loss(x, k1, k2, scale, bias):
            # sum in bf16 then cast: keeps every cotangent bf16 (conv
            # backward requires matching dtypes)
            return jnp.sum(block(x, k1, k2, scale, bias)).astype(jnp.float32)

        fwdbwd = jax.grad(loss, argnums=(0, 1, 2))

        t_f = timed_chained(block, x, k1, k2, scale, bias, iters=args.iters)
        t_fb = timed_chained(lambda xx, *rest: fwdbwd(xx, *rest)[0], x, k1, k2, scale, bias,
                             iters=args.iters)

        act = b * h * w * c * 2  # bf16 bytes per activation tensor
        # fwd floor: read x, write+read intermediate, write out (+ skip read
        # folded into conv2 epilogue) = 4 act passes + skip read = 5
        floor_f = 5 * act / 1e9 / HBM_PEAK_GBS
        # fused floor: read x, write out, skip read = 3 passes
        floor_fused = 3 * act / 1e9 / HBM_PEAK_GBS
        flops = 2 * 2 * 9 * c * c * h * w * b  # two 3x3 convs
        results.append({
            "branch": f"{h}x{w}x{c}", "batch": b,
            "fwd_ms": round(t_f * 1e3, 3),
            "fwd_floor_ms": round(floor_f * 1e3, 3),
            "fwd_frac_of_floor": round(floor_f / t_f, 3),
            "fused_floor_ms": round(floor_fused * 1e3, 3),
            "max_fused_saving_ms": round((t_f - floor_fused) * 1e3, 3),
            "fwdbwd_ms": round(t_fb * 1e3, 3),
            "conv_tflops_at_fwd": round(flops / t_f / 1e12, 1),
        })
        print(json.dumps(results[-1]), flush=True)

    # fuse chain: branch1 -> branch0 contribution (1x1 conv + BN + 2x nearest
    # upsample + add into branch0)
    h, w, c0, c1 = 64, 48, 32, 64
    x0 = jnp.asarray(rng.normal(size=(b, h, w, c0)).astype(np.float32)).astype(jnp.bfloat16)
    x1 = jnp.asarray(rng.normal(size=(b, h // 2, w // 2, c1)).astype(np.float32)).astype(jnp.bfloat16)
    kf = jnp.asarray(rng.normal(size=(1, 1, c1, c0)).astype(np.float32) * 0.1).astype(jnp.bfloat16)

    def fuse(x0, x1, kf):
        y = jax.lax.conv_general_dilated(
            x1, kf, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
        return jnp.maximum(x0 + y, 0)

    t_fuse = timed_chained(lambda a, b_, k: fuse(a, b_, k), x0, x1, kf, iters=args.iters)
    bytes_floor = (x0.size + x1.size + x0.size) * 2 / 1e9 / HBM_PEAK_GBS
    out = {
        "fuse_chain": f"{h//2}x{w//2}x{c1}->{h}x{w}x{c0}", "batch": b,
        "ms": round(t_fuse * 1e3, 3),
        "floor_ms": round(bytes_floor * 1e3, 3),
        "frac_of_floor": round(bytes_floor / t_fuse, 3),
    }
    print(json.dumps(out), flush=True)
    results.append(out)
    with open("PROBE_HRNET_BLOCK.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "results": results}, f)


if __name__ == "__main__":
    main()
