"""On-hardware parity artifact for the Pallas warp kernel.

Asserts, on the real TPU, over randomly rotated/scaled/translated crops:
  * affine_crop_pallas == affine_crop_mxu (the XLA two-stage formulation)
    bit-for-bit (the README's "bit-identical to the XLA path" claim);
  * both against the exact-parity gather warp (affine_crop), recording the
    bounded two-stage resampling deviation (~1.5 gray levels mean on noise
    images, see tests/test_warp.py).

Writes PALLAS_PARITY.json at the repo root (the recorded artifact VERDICT
round-2 item #6 asks for).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from simple_pose_tpu.ops.affine import get_affine_transform
    from simple_pose_tpu.ops.pallas_warp import affine_crop_pallas
    from simple_pose_tpu.ops.warp import affine_crop, affine_crop_mxu

    rng = np.random.default_rng(0)
    b, canvas = 32, 640
    crop_shape = (256, 192)
    inter = int(np.ceil(np.hypot(*crop_shape))) + 8

    # iid noise is the adversarial worst case for comparing two resampling
    # factorizations; natural images are smooth, so measure both
    noise = rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8)
    yy, xx = np.mgrid[0:canvas, 0:canvas]
    smooth = np.stack([
        (127 + 90 * np.sin(xx / 37.0 + i) * np.cos(yy / 53.0 - i)).astype(np.uint8)
        for i in range(3)
    ], -1)
    smooth = np.broadcast_to(smooth, (b, canvas, canvas, 3)).copy()
    images = noise
    trans = np.zeros((b, 2, 3), np.float32)
    for i in range(b):
        center = rng.uniform(180, canvas - 180, 2)
        scale = np.array([rng.uniform(120, 320), rng.uniform(160, 420)])
        rot = rng.uniform(-40, 40)
        t, _ = get_affine_transform(center, scale, rot, (crop_shape[1], crop_shape[0]))
        trans[i] = t

    trans_d = jax.device_put(trans)

    pallas_fn = jax.jit(lambda c, t: affine_crop_pallas(c, t, crop_shape, inter=inter))
    mxu_fn = jax.jit(lambda c, t: affine_crop_mxu(c, t, crop_shape, inter=inter))
    gather_fn = jax.jit(lambda c, t: affine_crop(c, t, crop_shape))

    record = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "batch": b,
        "crop_shape": list(crop_shape),
        "rot_range_deg": [-40, 40],
    }
    for name, imgs in (("noise", images), ("smooth", smooth)):
        imgs_d = jax.device_put(imgs)
        out_pallas = np.asarray(pallas_fn(imgs_d, trans_d))
        out_mxu = np.asarray(mxu_fn(imgs_d, trans_d))
        out_gather = np.asarray(gather_fn(imgs_d, trans_d))
        d_pm = np.abs(out_pallas - out_mxu)
        d_pg = np.abs(out_pallas - out_gather)
        record[f"{name}_pallas_vs_mxu_max_abs"] = float(d_pm.max())
        record[f"{name}_pallas_vs_mxu_mean_abs"] = float(d_pm.mean())
        record[f"{name}_pallas_vs_gather_max_abs"] = float(d_pg.max())
        record[f"{name}_pallas_vs_gather_mean_abs"] = float(d_pg.mean())
    record["pallas_vs_mxu_max_abs"] = max(
        record["noise_pallas_vs_mxu_max_abs"], record["smooth_pallas_vs_mxu_max_abs"])
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "PALLAS_PARITY.json")
    with open(out_path, "w") as wf:
        json.dump(record, wf, indent=1)
    # One schema-conformant line for BENCH_ALL collection ({metric, value,
    # unit}); the full parity record lives in PALLAS_PARITY.json.
    print(json.dumps({
        "metric": "pallas_crop_parity_max_abs_vs_mxu",
        "value": record["pallas_vs_mxu_max_abs"],
        "unit": "abs_err",
        "detail": "PALLAS_PARITY.json",
    }))
    assert record["pallas_vs_mxu_max_abs"] == 0.0, "pallas != mxu on hardware"


if __name__ == "__main__":
    main()
