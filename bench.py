"""Benchmark: training person-crops/sec/chip at 256x192 on pose_resnet50_dconv.

Measures the full fused device program (uint8 canvas -> affine crop ->
normalize -> forward -> masked MSE -> backward -> Adam -> EMA) -- the same
work the reference does per crop across its CPU dataloader + GPU step.

Baseline (BASELINE.md): the reference trains 149,813 crops x 180 epochs in
~21 h on 4 GPUs at batch 128 => ~89 crops/sec/GPU.  vs_baseline is the
speedup over that per-chip number.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

BASELINE_CROPS_PER_SEC_PER_CHIP = 89.0



def _enable_compile_cache():
    """Persistent XLA compilation cache: repeated bench/entry runs skip the
    (minutes-long over tunneled TPU runtimes) recompilation."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

def _require_live_backend(timeout_s: int = 240):
    """Fail fast (exit 3) if `import jax` would hang on a dead TPU tunnel.

    The axon sitecustomize phones the tunnel during jax import (even with
    JAX_PLATFORMS=cpu), so a tunnel outage turns the bench into an
    indefinite hang; probe importability in a killable subprocess first."""
    import subprocess
    import sys

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, check=True, capture_output=True)
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError) as e:
        print(f"bench: jax backend unavailable ({type(e).__name__}); "
              "TPU tunnel down?", file=sys.stderr)
        raise SystemExit(3)


def main():
    _require_live_backend()
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.train.solver import TrainState, make_train_step

    n_dev = len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    batch = int(os.environ.get("BENCH_BATCH", 128 if on_tpu else 8))
    canvas = 640 if on_tpu else 128
    crop_shape, out_shape = ((256, 192), (64, 48)) if on_tpu else ((64, 64), (16, 16))
    steps = int(os.environ.get("BENCH_STEPS", 20 if on_tpu else 2))
    model_name = os.environ.get("BENCH_MODEL", "")  # e.g. "pose_hrnet:w32"
    remat = os.environ.get("BENCH_REMAT", "0") == "1"

    mesh = make_mesh({"data": n_dev})
    dtype = "bfloat16" if on_tpu else None  # mixed precision: f32 params, bf16 compute
    if model_name:
        mtype, mname = model_name.split(":")
        model = build_model(mtype, mname, num_joints=17, train=True, dtype=dtype, remat=remat)
        metric_model = f"{mtype}_{mname}"
    else:
        model = build_model(
            "pose_resnet_dconv", "resnet50" if on_tpu else "resnet18",
            num_joints=17, reduction=True, train=True, dtype=dtype, remat=remat,
        )
        metric_model = "resnet50dconv"
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + crop_shape + (3,), jnp.float32))
    tx = optax.adam(multistep_schedule(1e-3, [120, 160], 0.1, 1000))
    state = TrainState(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        step=jnp.zeros((), jnp.int32),
    )
    state = jax.device_put(state, replicated(mesh))

    rng = np.random.default_rng(0)
    scale = canvas / 2
    host_batch = {
        "canvas": rng.integers(0, 255, size=(batch, canvas, canvas, 3), dtype=np.uint8),
        "trans": np.tile(
            np.array([[crop_shape[1] / scale, 0, 4], [0, crop_shape[0] / scale, 4]], np.float32),
            (batch, 1, 1),
        ),
        "joints": np.concatenate(
            [
                rng.uniform(2, out_shape[1] - 2, size=(batch, 17, 1)).astype(np.float32),
                rng.uniform(2, out_shape[0] - 2, size=(batch, 17, 1)).astype(np.float32),
                np.ones((batch, 17, 1), np.float32),
            ],
            -1,
        ),
        "trans_inv": np.tile(np.array([[4.0, 0, 0], [0, 4.0, 0]], np.float32), (batch, 1, 1)),
    }
    dev_batch = shard_batch(host_batch, mesh)

    train_step = jax.jit(
        make_train_step(model, tx, out_shape, crop_shape, amp=on_tpu), donate_argnums=0
    )
    # warmup / compile; sync via host transfer (block_until_ready can return
    # early under tunneled TPU platforms)
    for _ in range(3):
        state, metrics = train_step(state, dev_batch)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = train_step(state, dev_batch)
    float(metrics["loss"])
    dt = time.perf_counter() - t0

    crops_per_sec = batch * steps / dt
    per_chip = crops_per_sec / n_dev
    print(
        json.dumps(
            {
                "metric": f"train_crops_per_sec_per_chip_256x192_{metric_model}"
                if on_tpu
                else "train_crops_per_sec_per_chip_cpu_smoke",
                "value": round(per_chip, 2),
                "unit": "crops/s/chip",
                "vs_baseline": round(per_chip / BASELINE_CROPS_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
