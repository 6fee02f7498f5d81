"""Capture a device trace of the fused train step and print the top
HLO ops/fusions by self-time (xprof op_profile), to target fwd+bwd
optimization precisely instead of by ablation.

    python scripts/profile_xplane.py            # capture + report
    PROF_MODEL=pose_hrnet:w32 PROF_BATCH=256 python scripts/profile_xplane.py

Writes the raw trace under /tmp/sp_profile; prints a JSON line per top op.
"""

import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOGDIR = os.environ.get("PROF_LOGDIR", "/tmp/sp_profile")


def capture_eval():
    """Trace the PoseEvaluator step (crop -> forward -> decode).

    PROF_QUANT=w8a8 traces the quantized program; PROF_QUANT_STATIC=1
    additionally calibrates static activation scales on the synthetic batch
    first (scale VALUES don't change the compiled graph structure, which is
    what the folded-int8 question is about: do the dequant->BN->relu->
    requant boundary f32 tensors hit HBM or fuse into the conv epilogue?)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    batch = int(os.environ.get("PROF_BATCH", 128))
    model_name = os.environ.get("PROF_MODEL", "pose_resnet_dconv:resnet50")
    mtype, mname = model_name.split(":")
    canvas = int(os.environ.get("PROF_CANVAS", 640))
    quant = os.environ.get("PROF_QUANT") or None
    ev = PoseEvaluator({"type": mtype, "name": mname, "num_joints": 17,
                        "reduction": mtype != "pose_hrnet"}, None,
                       tuple(int(v) for v in os.environ.get("PROF_INPUT", "192,256").split(",")),
                       quant=quant,
                       fused_layer1=os.environ.get("PROF_FUSEDL1") == "1")
    s = canvas / 256  # decomposition scale; exact value irrelevant to timing
    # canvas generated on device: host->device staging of the uint8 batch
    # is tunnel-limited (~25 MB/s measured) in this dev env (see bench_eval)
    b = {
        "canvas": jax.jit(lambda k: jax.random.randint(
            k, (batch, canvas, canvas, 3), 0, 255, "uint8"))(jax.random.key(0)),
        "trans": jax.device_put(np.tile(
            np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (batch, 1, 1))),
        "trans_inv": jax.device_put(np.tile(
            np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (batch, 1, 1))),
    }
    if quant and os.environ.get("PROF_QUANT_STATIC") == "1":
        ev.calibrate([b], num_batches=1)
    out = ev._step(ev.variables, ev._layer1_folded, b)
    float(jnp.sum(out["kps"]))
    with jax.profiler.trace(LOGDIR):
        for _ in range(5):
            out = ev._step(ev.variables, ev._layer1_folded, b)
        float(jnp.sum(out["kps"]))
    print("captured", flush=True)


def capture():
    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.train.solver import TrainState, make_train_step

    batch = int(os.environ.get("PROF_BATCH", 128))
    model_name = os.environ.get("PROF_MODEL", "pose_resnet_dconv:resnet50")
    mtype, mname = model_name.split(":")
    canvas, crop_shape, out_shape = 640, (256, 192), (64, 48)
    kw = {"reduction": True} if mtype != "pose_hrnet" else {}
    model = build_model(mtype, mname, num_joints=17, train=True, dtype="bfloat16", **kw)
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
    batch_d = jax.device_put({
        "canvas": rng.integers(0, 255, (batch, canvas, canvas, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[crop_shape[1] / scale, 0, 4], [0, crop_shape[0] / scale, 4]],
                                  np.float32), (batch, 1, 1)),
        "joints": np.concatenate([
            rng.uniform(2, out_shape[1] - 2, (batch, 17, 1)).astype(np.float32),
            rng.uniform(2, out_shape[0] - 2, (batch, 17, 1)).astype(np.float32),
            np.ones((batch, 17, 1), np.float32)], -1),
        "trans_inv": np.tile(np.array([[4.0, 0, 0], [0, 4.0, 0]], np.float32), (batch, 1, 1)),
    })
    step = jax.jit(make_train_step(model, tx, out_shape, crop_shape, amp=True))
    for _ in range(3):
        state, m = step(state, batch_d)
    float(m["loss"])
    with jax.profiler.trace(LOGDIR):
        for _ in range(5):
            state, m = step(state, batch_d)
        float(m["loss"])
    print("captured", flush=True)


def report(top=40):
    """Parse the xplane proto directly: sum self-time per HLO op name on the
    device planes (works without the tensorboard web UI)."""
    from xprof.convert import raw_to_tool_data as rtd

    run_dir = None
    for cand in sorted(glob.glob(os.path.join(LOGDIR, "plugins/profile/*")), reverse=True):
        if glob.glob(os.path.join(cand, "*.xplane.pb")):
            run_dir = cand
            break
    if run_dir is None:
        print(json.dumps({"error": "no xplane capture found"}))
        return
    xplane = glob.glob(os.path.join(run_dir, "*.xplane.pb"))
    data, _ = rtd.xspace_to_tool_data(xplane, "framework_op_stats", {})
    # data is a JSON/gviz payload; fall back to op_profile if needed
    out_path = os.path.join(LOGDIR, "op_stats.json")
    if isinstance(data, bytes):
        data = data.decode("utf-8", "replace")
    with open(out_path, "w") as f:
        f.write(data if isinstance(data, str) else json.dumps(data))
    print(json.dumps({"wrote": out_path, "bytes": os.path.getsize(out_path)}))


def summarize(top=30, out=None):
    """Reduce op_stats.json (gviz table) to the fields the HBM-boundary
    question needs: per-op self time, bytes/bandwidth, bound_by.  Prints one
    JSON line per top op and an aggregate by category."""
    with open(os.path.join(LOGDIR, "op_stats.json")) as f:
        data = json.load(f)
    table = data[0] if isinstance(data, list) else data
    cols = [c.get("label") or c.get("id") for c in table["cols"]]
    rows = [[(c or {}).get("v") for c in r["c"]] for r in table["rows"]]
    recs = [dict(zip(cols, r)) for r in rows]

    def pick(rec, *subs):
        for k, v in rec.items():
            kl = (k or "").lower()
            if all(s in kl for s in subs):
                return v
        return None

    if any("host/device" in (c or "").lower() for c in cols):
        dev = [r for r in recs if str(pick(r, "host/device")).lower() == "device"]
        recs = dev or recs  # CPU captures have no device plane; keep all
    for rec in recs:
        rec["_self_us"] = pick(rec, "self", "time") or pick(rec, "total", "self") or 0
    recs.sort(key=lambda r: -(r["_self_us"] or 0))
    print(json.dumps({"columns": cols}))
    picked = []
    for rec in recs[:top]:
        picked.append({
            "op": pick(rec, "op", "name") or pick(rec, "name"),
            "category": pick(rec, "category") or pick(rec, "type"),
            "occurrences": pick(rec, "occur"),
            "self_us": rec["_self_us"],
            "bound_by": pick(rec, "bound"),
            "gbps": pick(rec, "bandwidth") or pick(rec, "gb"),
            "flop_rate": pick(rec, "flop", "rate") or pick(rec, "gflop"),
        })
        print(json.dumps(picked[-1]))
    by_cat = {}
    for rec in recs:
        cat = pick(rec, "category") or pick(rec, "type") or "?"
        by_cat[cat] = by_cat.get(cat, 0.0) + float(rec["_self_us"] or 0)
    agg = dict(sorted(by_cat.items(), key=lambda kv: -kv[1]))
    print(json.dumps({"self_time_by_category": agg}))
    if out:
        with open(out, "w") as f:
            json.dump({"top_ops": picked, "self_time_by_category": agg}, f)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode == "eval":
        capture_eval()
        report()
    elif mode == "summarize":
        summarize(top=int(os.environ.get("PROF_TOP", 30)),
                  out=os.environ.get("PROF_SUMMARY_OUT"))
    else:
        if mode in ("all", "capture"):
            capture()
        if mode in ("all", "report"):
            report()
