"""Decompose the train-step time on real hardware: crop / encode / forward /
backward / optimizer+EMA, plus an estimated-FLOPs MFU readout per stage.

Writes one JSON line per timed program.  Drives VERDICT round-2 item #2
(raise model-step MFU); run over the TPU tunnel with nohup.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, steps=20, warmup=3):
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))  # tunnel-safe sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / steps


if __name__ == "__main__":
    _cache()


    import jax
    import jax.numpy as jnp
    import optax

    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.ops.heatmap import encode_unbiased
    from simple_pose_tpu.ops.pallas_warp import affine_crop_pallas
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.train.solver import TrainState, make_train_step

    batch = int(os.environ.get("PROF_BATCH", 128))
    model_name = os.environ.get("PROF_MODEL", "pose_resnet_dconv:resnet50")
    mtype, mname = model_name.split(":")
    canvas, crop_shape, out_shape = 640, (256, 192), (64, 48)
    kw = {"reduction": True} if mtype != "pose_hrnet" else {}
    model = build_model(mtype, mname, num_joints=17, train=True, dtype="bfloat16", **kw)
    eval_model = build_model(mtype, mname, num_joints=17, train=False, dtype="bfloat16", **kw)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + crop_shape + (3,), jnp.float32))
    tx = optax.adam(multistep_schedule(1e-3, [120, 160], 0.1, 1000))
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=jax.tree.map(jnp.copy, variables["params"]),
        ema_batch_stats=jax.tree.map(jnp.copy, variables["batch_stats"]),
        step=jnp.zeros((), jnp.int32),
    )
    state = jax.device_put(state)

    rng = np.random.default_rng(0)
    scale = canvas / 2
    canvases = jax.device_put(rng.integers(0, 255, (batch, canvas, canvas, 3), dtype=np.uint8))
    trans = jax.device_put(np.tile(
        np.array([[crop_shape[1] / scale, 0, 4], [0, crop_shape[0] / scale, 4]], np.float32),
        (batch, 1, 1)))
    joints = jax.device_put(np.concatenate([
        rng.uniform(2, out_shape[1] - 2, (batch, 17, 1)).astype(np.float32),
        rng.uniform(2, out_shape[0] - 2, (batch, 17, 1)).astype(np.float32),
        np.ones((batch, 17, 1), np.float32)], -1))
    x_crops = jax.device_put(rng.normal(0, 1, (batch,) + crop_shape + (3,)).astype(np.float32))
    x_bf16 = jax.device_put(np.asarray(x_crops, np.float32).astype(jnp.bfloat16))

    results = {}

    # 1. crop only
    inter = int(np.ceil(np.hypot(*crop_shape))) + 8
    crop_fn = jax.jit(lambda c, t: affine_crop_pallas(c, t, crop_shape, inter=inter))
    results["crop_pallas"] = timed(crop_fn, (canvases, trans))

    # 2. encode only
    enc = jax.jit(lambda j: encode_unbiased(j, out_shape))
    results["encode"] = timed(enc, (joints,))

    # 3. eval forward (bf16)
    fwd = jax.jit(lambda v, x: eval_model.apply(v, x))
    ev = {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    results["forward_eval"] = timed(fwd, (ev, x_bf16))

    # 4. train forward+backward (no crop/enc/optimizer)
    targets, weights = encode_unbiased(np.asarray(joints), out_shape)
    targets = jax.device_put(np.asarray(targets))
    mask = jax.device_put(np.asarray(weights)[..., None, None])

    def fb(params, stats, x):
        def loss_fn(p):
            preds, upd = model.apply({"params": p, "batch_stats": stats}, x,
                                     mutable=["batch_stats"])
            preds = preds.transpose(0, 3, 1, 2).astype(jnp.float32)
            return 0.5 * jnp.mean((preds * mask - targets * mask) ** 2), upd

        (l, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return l, g

    fbj = jax.jit(fb)
    results["forward_backward"] = timed(fbj, (state.params, state.batch_stats, x_bf16))

    # 5. optimizer + EMA only (donated state: rebind each iteration)
    state_np = jax.tree.map(np.asarray, state)
    _, grads = fbj(state.params, state.batch_stats, x_bf16)
    grads = jax.device_put(jax.tree.map(np.asarray, grads))

    def opt(state, grads):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        from simple_pose_tpu.train.ema import ema_update

        new_ema = ema_update(state.ema_params, new_params, state.step + 1)
        return state.replace(params=new_params, opt_state=new_opt,
                             ema_params=new_ema, step=state.step + 1)

    optj = jax.jit(opt, donate_argnums=0)
    st = jax.device_put(state_np)
    for _ in range(3):
        st = optj(st, grads)
    float(jnp.sum(st.step))
    t0 = time.perf_counter()
    for _ in range(20):
        st = optj(st, grads)
    float(jnp.sum(st.step))
    results["optimizer_ema"] = (time.perf_counter() - t0) / 20

    # 6. full fused step
    state = jax.device_put(state_np)
    batch_d = {"canvas": canvases, "trans": trans, "joints": joints,
               "trans_inv": jax.device_put(np.tile(np.array([[4.0, 0, 0], [0, 4.0, 0]],
                                                            np.float32), (batch, 1, 1)))}
    step = jax.jit(make_train_step(model, tx, out_shape, crop_shape, amp=True), donate_argnums=0)

    for _ in range(3):
        state, m = step(state, batch_d)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        state, m = step(state, batch_d)
    float(m["loss"])
    results["full_step"] = (time.perf_counter() - t0) / 20

    for k, v in results.items():
        print(json.dumps({"stage": k, "ms": round(v * 1000, 3),
                          "crops_per_sec": round(batch / v, 1)}), flush=True)
