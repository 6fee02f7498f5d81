"""Worker process for the 2-process multi-host test (test_multihost.py).

Each worker is one "host" with 4 virtual CPU devices; together they form the
8-device global mesh.  This executes, for real, every process_count > 1
branch the single-process suite can't reach: jax.distributed wiring
(parallel/distributed.py), make_array_from_process_local_data
(parallel/mesh.py shard_batch), per-host batch-count equalization
(data/pipeline.py batches_per_epoch), and the validate() allgather
(train/solver.py) -- the SPMD replacement for the reference DDP solver
(ddp_pose_resnet_solver.py:33-48,144-168).

Usage: python multihost_worker.py <pid> <nproc> <port> <img_root> <ann> <out_dir> [cfg_json]

cfg_json (optional): path to a JSON dict deep-merged over the base config --
the skewed-dedup test uses it to change batch size / dataset knobs without a
second worker script.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
img_root, ann_path, out_dir = sys.argv[4:7]
cfg_override = json.load(open(sys.argv[7])) if len(sys.argv) > 7 else {}

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
# shared persistent compile cache: reruns skip the per-worker compiles, which
# shrinks cross-worker skew at the first collective (1-core box)
jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_mh_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from simple_pose_tpu.parallel.distributed import host_info, init_multihost  # noqa: E402

# generous shutdown barrier: on this 1-core box the two workers' exit
# times can skew by minutes when the whole suite contends for the core
info = init_multihost(coordinator_address=f"localhost:{port}", num_processes=nproc,
                      process_id=pid, shutdown_timeout_seconds=1200)
assert info["process_count"] == nproc, info
assert info["global_devices"] == 4 * nproc, info

if cfg_override.get("mode") == "fused":
    # fused detect->pose dataset eval over the global mesh: process-sharded
    # images with equalized per-host batch counts, output allgather -- every
    # host must hold the identical full prediction list (evalkit/fused.py
    # multi-host path; the reference has no multi-process eval at all)
    from simple_pose_tpu.evalkit.fused import fused_eval  # noqa: E402
    from simple_pose_tpu.parallel.mesh import make_mesh  # noqa: E402

    mesh = make_mesh({"data": 4 * nproc})
    stats = fused_eval(
        img_root, ann_path,
        {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
        None, None, scale_name="s", det_size=(128, 128), input_shape=(64, 64),
        batch_size=4, max_people=4, canvas=192, det_conf=1e-4, amp=None,
        mesh=mesh, out_path=os.path.join(out_dir, f"fused_{pid}.json"))
    with open(os.path.join(out_dir, f"worker_{pid}.json"), "w") as wf:
        json.dump({"host_info": host_info(), "fused_ap": stats["AP"]}, wf)
    print(f"worker {pid} done (fused)", flush=True)
    sys.exit(0)

from simple_pose_tpu.train.config import load_config  # noqa: E402
from simple_pose_tpu.train.solver import PoseSolver  # noqa: E402

base = {
    "model_name": "mh_test",
    "data": {
        "train_ann_path": ann_path, "val_ann_path": ann_path,
        "train_img_root": img_root, "val_img_root": img_root,
        # per-host batch: the global batch is 4 * nproc = 8, matching the
        # single-process baseline run in the parent test
        "batch_size": 4, "num_workers": 2, "canvas": 192,
        "input_shape": [64, 64],
    },
    "model": {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
    "optim": {"lr": 1e-3, "milestones": [2], "epochs": 1, "gamma": 0.1},
    "val": {"interval": 1, "weight_path": os.path.join(out_dir, "w")},
    "mesh": {"data": 4 * nproc},
    "seed": 11,
}
for k, v in cfg_override.items():
    if isinstance(v, dict):
        base.setdefault(k, {}).update(v)
    else:
        base[k] = v
cfg = load_config(base)

solver = PoseSolver(cfg)
solver.init_state()
# val on the untrained (seed-deterministic) state: must equal the
# single-process AP bit-for-bit up to float noise
print(f"worker {pid}: validate(init)", flush=True)
stats0 = solver.validate(0, results_path=os.path.join(out_dir, f"val_init_{pid}.json"))
# one train epoch: executes the cross-host gradient/BN psum over "DCN"
print(f"worker {pid}: train_epoch", flush=True)
train_metrics = solver.train_epoch(0, log_every=0)
stats1 = solver.validate(1, results_path=os.path.join(out_dir, f"val_after_{pid}.json"))

# standalone eval workflow over the global mesh (round-3b): process-sharded
# pipeline, per-host decode, result allgather (workflows._gather_results) --
# every host must produce the identical full result list and AP
from simple_pose_tpu.evalkit.workflows import predicts_by_gt  # noqa: E402

print(f"worker {pid}: wf predicts_by_gt", flush=True)
wf_stats = predicts_by_gt(
    img_root, ann_path,
    {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
    weights=None, batch_size=4, input_shape=(64, 64), canvas=192,
    out_path=os.path.join(out_dir, f"wf_gt_{pid}.json"),
    amp=False, mesh=solver.mesh)

pipe = solver.train_pipe
with open(os.path.join(out_dir, f"worker_{pid}.json"), "w") as wf:
    json.dump({
        "host_info": host_info(),
        "ap_init": stats0["AP"],
        "wf_gt_ap": wf_stats["AP"],
        "train_loss": train_metrics["loss"],
        "ap_after": stats1["AP"],
        "steps": int(solver.state.step),
        # equalization evidence for the skewed-dataset test: every host
        # computes every host's shard/plan sizes from the same global view,
        # so these must be identical across workers
        "records_per_host": [
            len(pipe._epoch_order_for(0, h)) for h in range(nproc)],
        "batches_per_epoch": pipe.batches_per_epoch(),
        "dedup_plan_len_per_host": (
            [len(pipe._pack_epoch(0, process_index=h)) for h in range(nproc)]
            if pipe.dedup_canvases else None),
        "dedup_batches": (pipe.dedup_batches_per_epoch(0)
                          if pipe.dedup_canvases else None),
    }, wf)
print(f"worker {pid} done", flush=True)
