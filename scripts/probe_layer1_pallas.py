"""A/B probe: HRNet layer1 (4 eval-mode Bottlenecks on the 64x48x256
full-resolution stream) as XLA convs vs the fused VMEM-resident Pallas
chain (ops/pallas_bottleneck.py).  The VERDICT-r3 #8 costed attempt at the
layer1 HBM concentration (23.8% of the HRNet step, docs/PERF.md xprof).

    python scripts/probe_layer1_pallas.py [--batch 256 --iters 100]

Prints one JSON line; timing follows docs/PERF.md rules (pre-staged inputs,
long averaged loops, sync by host-reading a scalar).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--f32", action="store_true", help="compute in f32 (default bf16)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.ops.pallas_bottleneck import (
        bottleneck_chain_pallas,
        bottleneck_chain_xla,
    )

    cd = jnp.float32 if args.f32 else jnp.bfloat16
    rng = np.random.default_rng(0)

    def blk(cin, width, cout, ds):
        b = {
            "w1": rng.normal(0, 0.05, (cin, width)).astype(np.float32),
            "b1": rng.normal(0, 0.05, width).astype(np.float32),
            "w2": rng.normal(0, 0.05, (3, 3, width, width)).astype(np.float32),
            "b2": rng.normal(0, 0.05, width).astype(np.float32),
            "w3": rng.normal(0, 0.05, (width, cout)).astype(np.float32),
            "b3": rng.normal(0, 0.05, cout).astype(np.float32),
            "wd": rng.normal(0, 0.05, (cin, cout)).astype(np.float32) if ds else None,
        }
        if ds:
            b["bd"] = rng.normal(0, 0.05, cout).astype(np.float32)
        return b

    # HRNet layer1 topology: stem out 64ch -> Bottleneck(64, ds to 256) + 3x Bottleneck(256)
    blocks = [blk(64, 64, 256, True)] + [blk(256, 64, 256, False) for _ in range(3)]
    blocks = [
        {k: (jnp.asarray(v) if v is not None else None) for k, v in b.items()} for b in blocks
    ]
    x = jax.device_put(
        jnp.asarray(rng.normal(0, 1, (args.batch, 64, 48, 64)).astype(np.float32), dtype=cd)
    )

    def xla_conv_chain(x, blocks):
        """What the eval graph runs today: lax convs (XLA folds the BN affine
        for free, PERF.md BN-fold probe) -- NOT the 9-matmul reformulation,
        so the baseline is XLA's own conv lowering."""
        y = x
        for b in blocks:
            idn = y
            if b["wd"] is not None:
                idn = (y.astype(jnp.float32) @ b["wd"].astype(jnp.float32)) + b["bd"]
            m = jnp.maximum(
                jax.lax.dot_general(y.astype(cd), b["w1"].astype(cd),
                                    (((3,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) + b["b1"], 0.0)
            m = jax.lax.conv_general_dilated(
                m.astype(cd), b["w2"].astype(cd), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            m = jnp.maximum(m + b["b2"], 0.0)
            out = jax.lax.dot_general(m.astype(cd), b["w3"].astype(cd),
                                      (((3,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32) + b["b3"]
            y = jnp.maximum(out + idn, 0.0).astype(x.dtype)
        return y

    fns = {
        "xla_conv": jax.jit(lambda t: xla_conv_chain(t, blocks)),
        "xla_matmul": jax.jit(lambda t: bottleneck_chain_xla(t, blocks, compute_dtype=cd)),
        "pallas_fused": jax.jit(lambda t: bottleneck_chain_pallas(t, blocks, compute_dtype=cd)),
    }

    def sync(v):
        return float(jnp.sum(v.astype(jnp.float32)))

    out = {"metric": "hrnet_layer1_chain", "batch": args.batch,
           "dtype": str(cd.__name__), "backend": jax.default_backend()}
    ref = None
    for name, fn in fns.items():
        try:
            y = fn(x)
            s = sync(y)
            if ref is None:
                ref = np.asarray(y, np.float32)
            else:
                out[f"{name}_max_abs_vs_xla_conv"] = float(
                    np.max(np.abs(np.asarray(y, np.float32) - ref)))
            for _ in range(args.warmup):
                sync(fn(x))
            t0 = time.perf_counter()
            for _ in range(args.iters):
                y = fn(x)
            sync(y)
            dt = (time.perf_counter() - t0) / args.iters
            out[f"{name}_ms"] = round(dt * 1e3, 3)
            out[f"{name}_crops_per_s"] = round(args.batch / dt, 1)
        except Exception as e:  # record the failure mode, keep probing
            out[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:300]}"
    if "xla_conv_ms" in out and "pallas_fused_ms" in out:
        out["pallas_speedup_vs_xla_conv"] = round(out["xla_conv_ms"] / out["pallas_fused_ms"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
