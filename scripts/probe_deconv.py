"""Probe: is the lhs_dilation transposed conv leaving MXU FLOPs on the table?

Compares the exact TorchConvTranspose (k4 s2 p1 via input dilation) against
the subpixel decomposition (4 k2-convs, one per output parity class, then
pixel-shuffle interleave) -- mathematically identical, but the subpixel form
never multiplies by stuffed zeros.  Also prints XLA's own cost analysis for
the full train step so MFU claims use the compiler's FLOP count.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=20, warmup=3):
    import jax.numpy as jnp

    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / steps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def deconv_dilated(x, w):
        """TorchConvTranspose forward (models/layers.py): k4 s2 p1."""
        pad = 4 - 1 - 1
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w[::-1, ::-1], (1, 1), [(pad, pad), (pad, pad)],
            lhs_dilation=(2, 2), dimension_numbers=dn)

    def deconv_subpixel(x, w):
        """Same op as 4 parity convs + interleave (no zero-stuffed input).

        out[2i+di, 2j+dj] = sum_{a,b} x[i+a, j+b] wf[2a+di', 2b+dj', ...]
        derived from the dilated form; wf = spatially flipped kernel."""
        wf = w[::-1, ::-1]  # [4, 4, in, out]
        n, h, ww_, c = x.shape
        dn = lax.conv_dimension_numbers(x.shape, (2, 2, c, w.shape[3]), ("NHWC", "HWIO", "NHWC"))
        outs = {}
        for di in range(2):
            for dj in range(2):
                # taps of wf that land on output parity (di, dj):
                # rows 2a + (2 - di) mod 2 ... derive by matching the dilated
                # convolution: output index o = 2i + di reads dilated input
                # positions o + k - pad (pad=2), which are even (real) when
                # k == di mod 2 shifted; slice wf accordingly.
                wk = wf[(di + 0) % 2::2, (dj + 0) % 2::2]  # [2, 2, in, out]
                pad_i = (1, 1) if di == 0 else (0, 1)
                pad_j = (1, 1) if dj == 0 else (0, 1)
                o = lax.conv_general_dilated(
                    x, wk, (1, 1), [pad_i, pad_j], dimension_numbers=dn)
                outs[(di, dj)] = o[:, :h, :ww_, :]
        top = jnp.stack([outs[(0, 0)], outs[(0, 1)]], axis=3).reshape(n, h, 2 * ww_, -1)
        bot = jnp.stack([outs[(1, 0)], outs[(1, 1)]], axis=3).reshape(n, h, 2 * ww_, -1)
        return jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * ww_, -1)

    # correctness first (CPU-friendly sizes)
    x = jnp.asarray(rng.normal(size=(2, 8, 6, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(4, 4, 16, 8)).astype(np.float32))
    ref = deconv_dilated(x, w)
    got = deconv_subpixel(x, w)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(json.dumps({"probe": "subpixel_correctness", "max_abs_err": err,
                      "shapes_match": got.shape == ref.shape}))
    if err > 1e-3:
        print("subpixel decomposition WRONG; skipping timings")
        return

    if jax.default_backend() != "tpu":
        return

    # head-like sizes, bf16
    for (hh, wwid, cin, cout) in [(8, 6, 2048, 256), (16, 12, 256, 256), (32, 24, 256, 256)]:
        x = jnp.asarray(rng.normal(size=(128, hh, wwid, cin)).astype(np.float32)).astype(jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(4, 4, cin, cout)).astype(np.float32)).astype(jnp.bfloat16)
        f1 = jax.jit(deconv_dilated)
        f2 = jax.jit(deconv_subpixel)
        t1 = timed(f1, (x, w))
        t2 = timed(f2, (x, w))
        print(json.dumps({"probe": f"deconv_{cin}x{cout}_{hh}x{wwid}",
                          "dilated_ms": round(t1 * 1e3, 3),
                          "subpixel_ms": round(t2 * 1e3, 3)}))

    # XLA cost analysis of the full train step (honest MFU denominator)
    import optax

    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.train.solver import TrainState, make_train_step

    model = build_model("pose_resnet_dconv", "resnet50", num_joints=17, reduction=True,
                        train=True, dtype="bfloat16")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3), jnp.float32))
    tx = optax.flatten(optax.adam(multistep_schedule(1e-3, [120, 160], 0.1, 1000)))
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        step=jnp.zeros((), jnp.int32),
    )
    batch = {
        "canvas": np.zeros((128, 640, 640, 3), np.uint8),
        "trans": np.tile(np.array([[0.6, 0, 4], [0, 0.8, 4]], np.float32), (128, 1, 1)),
        "joints": np.ones((128, 17, 3), np.float32) * 10,
        "trans_inv": np.tile(np.array([[4.0, 0, 0], [0, 4.0, 0]], np.float32), (128, 1, 1)),
    }
    step = jax.jit(make_train_step(model, tx, (64, 48), (256, 192), amp=True), donate_argnums=0)
    lowered = step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", -1))
    print(json.dumps({"probe": "train_step_cost_analysis",
                      "flops_per_step_T": round(flops / 1e12, 3),
                      "bytes_accessed_GB": round(float(ca.get("bytes accessed", -1)) / 1e9, 2)}))

    state = jax.device_put(state)
    dbatch = jax.device_put(batch)
    for _ in range(3):
        state, m = step(state, dbatch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, dbatch)
    float(m["loss"])
    dt = (time.perf_counter() - t0) / 20
    print(json.dumps({"probe": "full_step_after_opt_flatten", "ms": round(dt * 1e3, 2),
                      "crops_per_sec": round(128 / dt, 1),
                      "tf_per_sec_xla_count": round(flops / dt / 1e12, 1)}))


if __name__ == "__main__":
    main()
