"""Ceiling probe for per-sample rotation-band bucketing (PERF.md candidate).

Training rotations are uniform in +-40 deg, so the static sin(40) y-band is
~2x the average need.  Bucketing the batch by |rotation| would let low-rot
samples run with a narrower band -- but it needs per-bucket sub-batches with
guaranteed rotation bounds (pipeline sorting + fixed split sizes + a
fallback program), so measure the CEILING first: the full crop kernel timed
with max_rot_deg 41 vs 20 vs 10 (band 88 -> 48 -> 32 at cw=96).  If even
the 10-degree band saves little, the bucketing machinery isn't worth it.

    python scripts/probe_rot_band.py [--batch 128] [--iters 50]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.ops import affine as A
    from simple_pose_tpu.ops.pallas_warp import affine_crop_pallas

    on_tpu = jax.default_backend() == "tpu"
    b = args.batch if on_tpu else 4
    canvas = 640 if on_tpu else 192
    out_hw = (256, 192) if on_tpu else (64, 64)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8))
    results = []
    for max_rot in (41.0, 20.0, 10.0):
        tr = np.zeros((b, 2, 3), np.float32)
        for i in range(b):
            c = rng.uniform(canvas * 0.3, canvas * 0.7, 2)
            w_ = rng.uniform(60, canvas * 0.4)
            s = np.array([w_, w_ * out_hw[0] / out_hw[1]]) * 1.25
            rot = rng.uniform(-max_rot + 1, max_rot - 1)
            t, _ = A.get_affine_transform(c, s, rot, (out_hw[1], out_hw[0]))
            tr[i] = t
        trj = jnp.asarray(tr)

        fn = jax.jit(lambda im, t, mr=max_rot: affine_crop_pallas(im, t, out_hw, max_rot_deg=mr))
        out = fn(imgs, trj)
        float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(imgs, trj)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / args.iters
        results.append({"max_rot_deg": max_rot, "ms": round(dt * 1e3, 3),
                        "crops_per_sec": round(b / dt, 0)})
        print(json.dumps(results[-1]), flush=True)

    with open("PROBE_ROT_BAND.json", "w") as f:
        json.dump({"backend": jax.default_backend(), "batch": b, "results": results}, f)


if __name__ == "__main__":
    main()
