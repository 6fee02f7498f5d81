"""End-to-end input-path training benchmark: JPEG decode -> packing ->
H2D -> fused device step, steady state -- the number bench.py's
device-program-only measurement deliberately excludes.

Builds a synthetic JPEG corpus once (COCO-like: 640-wide images, 1-4
person instances each), then measures:

  * host_pipeline: decode+pack throughput alone (no device),
  * train_e2e: the full solver-style loop (device_prefetch double buffering,
    canvas dedup on) including every host/H2D cost,
  * device_step: the device program alone on a staged batch (bench.py's
    number, for the same batch shape),
  * h2d_mbytes_per_batch: bytes actually shipped per batch (dedup'd).

One JSON line per metric.  NOTE on this environment: the TPU tunnel moves
~10 MB/s host<->device, ~3 orders of magnitude below a real v5e host DMA,
so train_e2e over the tunnel is a tunnel benchmark; the decomposition is
what transfers to production hardware (see README).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_corpus(root, num_images=192, seed=0):
    import cv2 as cv

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    records = []
    from simple_pose_tpu.data.coco import PoseRecord

    for i in range(num_images):
        w, h = 640, int(rng.integers(360, 480))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        path = os.path.join(root, f"{i:06d}.jpg")
        if not os.path.exists(path):
            cv.imwrite(path, img)
        for _ in range(int(rng.integers(1, 5))):  # 1-4 instances (mean 2.5)
            x0, y0 = rng.uniform(0, w - 160), rng.uniform(0, h - 160)
            bw, bh = rng.uniform(80, 150), rng.uniform(100, 160)
            joints = np.zeros((17, 3), np.float32)
            joints[:, 0] = rng.uniform(x0, x0 + bw, 17)
            joints[:, 1] = rng.uniform(y0, y0 + bh, 17)
            joints[:, 2] = 2
            records.append(PoseRecord(path, w, h, (x0, y0, x0 + bw, y0 + bh), joints, i))
    return records


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from simple_pose_tpu.data.pipeline import PosePipeline
    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.parallel.mesh import device_prefetch, make_mesh, replicated
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.train.solver import TrainState, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", 128 if on_tpu else 8))
    canvas = 640 if on_tpu else 128
    crop_shape, out_shape = ((256, 192), (64, 48)) if on_tpu else ((64, 64), (16, 16))
    steps = int(os.environ.get("BENCH_STEPS", 10 if on_tpu else 2))
    dedup = os.environ.get("BENCH_DEDUP", "1") == "1"

    records = build_corpus("/tmp/bench_e2e_corpus", num_images=192)
    mesh = make_mesh({"data": len(jax.devices())})
    n = mesh.devices.size
    U = (batch // 2 // n) * n if dedup else 0
    pipe = PosePipeline(
        records, batch, input_shape=(crop_shape[1], crop_shape[0]),
        output_shape=(out_shape[1], out_shape[0]), canvas=canvas, augment=True,
        seed=0, num_threads=int(os.environ.get("BENCH_THREADS", 8)),
        dedup_canvases=U, dedup_buckets=n if dedup else 1,
    )

    # --- host pipeline alone ------------------------------------------------
    it = iter(pipe.epoch(0))
    b0 = next(it)  # warm the decode caches / thread pool
    t0 = time.perf_counter()
    nb = 0
    for b in it:
        nb += 1
        if nb >= steps:
            break
    host_dt = (time.perf_counter() - t0) / max(nb, 1)
    bytes_per_batch = sum(v.nbytes for v in b0.values())
    print(json.dumps({"metric": "host_pipeline_crops_per_sec", "value": round(batch / host_dt, 1),
                      "unit": "crops/s", "dedup": dedup,
                      "h2d_mbytes_per_batch": round(bytes_per_batch / 1e6, 1)}), flush=True)

    # --- model/optimizer ----------------------------------------------------
    model = build_model("pose_resnet_dconv", "resnet50" if on_tpu else "resnet18",
                        num_joints=17, reduction=True, train=True,
                        dtype="bfloat16" if on_tpu else None)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + crop_shape + (3,), jnp.float32))
    tx = optax.adam(multistep_schedule(1e-3, [120, 160], 0.1, 1000))
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        step=jnp.zeros((), jnp.int32),
    )
    state = jax.device_put(state, replicated(mesh))
    step = jax.jit(make_train_step(model, tx, out_shape, crop_shape, amp=on_tpu, mesh=mesh),
                   donate_argnums=0)

    # --- device step alone on a staged batch --------------------------------
    from simple_pose_tpu.parallel.mesh import shard_batch

    staged = shard_batch(b0, mesh)
    for _ in range(2):
        state, m = step(state, staged)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, staged)
    float(m["loss"])
    dev_dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"metric": "device_step_crops_per_sec", "value": round(batch / dev_dt, 1),
                      "unit": "crops/s", "dedup": dedup}), flush=True)

    # --- full e2e loop: decode -> pack -> (prefetched) H2D -> step ----------
    count = 0
    t0 = time.perf_counter()
    for dbatch in device_prefetch(pipe.epoch(1), mesh):
        state, m = step(state, dbatch)
        count += 1
        if count >= steps:
            break
    float(m["loss"])
    e2e_dt = (time.perf_counter() - t0) / max(count, 1)
    print(json.dumps({
        "metric": "train_e2e_crops_per_sec", "value": round(batch / e2e_dt, 1),
        "unit": "crops/s", "dedup": dedup,
        "note": "includes JPEG decode + H2D; over the dev tunnel H2D is ~10MB/s",
    }), flush=True)


if __name__ == "__main__":
    main()
