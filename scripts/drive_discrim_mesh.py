"""Mesh-sharding variant of the discriminative AP gate (VERDICT-r3 #3).

The chip runs of scripts/drive_discrim_ap.py have one real device, so the
`mesh_sharded` variant never executes there.  This drive re-evaluates the
SAVED discrim checkpoints (the /tmp/discrim_* run dirs) on the virtual
8-device CPU mesh: unsharded vs data-sharded over Mesh(('data',8)), same
held-out corpus, same f32 compute on both sides — so any AP delta is pure
sharding semantics (uneven final batch, gather order), measured against a
target that can actually move (float AP ~0.76-0.81, not the saturated 1.0).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/drive_discrim_mesh.py /tmp/discrim_ejj5himy ...

Writes DISCRIM_MESH.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    from simple_pose_tpu.evalkit.workflows import predicts_by_gt
    from simple_pose_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) >= 8, f"need 8 virtual devices, got {len(jax.devices())}"
    runs = sys.argv[1:]
    out = {"backend": jax.default_backend(), "devices": len(jax.devices()), "runs": {}}
    for run_dir in runs:
        ckpts = [c for c in os.listdir(os.path.join(run_dir, "weights")) if c.endswith("_last")]
        assert len(ckpts) == 1, ckpts
        mtype = ckpts[0][: -len("_last")]
        # the drives train resnet18 trunks for the resnet families, w32 for hrnet
        mname = "w32" if mtype == "pose_hrnet" else "resnet18"
        model_cfg = {"type": mtype, "name": mname, "num_joints": 17}
        kw = dict(weights=os.path.join(run_dir, "weights", ckpts[0]), batch_size=32,
                  input_shape=(128, 128), canvas=224, amp=False,
                  out_path=os.path.join(run_dir, "res_mesh.json"))
        va_root = os.path.join(run_dir, "val", "imgs")
        va_ann = os.path.join(run_dir, "val", "ann.json")
        t0 = time.perf_counter()
        flat = predicts_by_gt(va_root, va_ann, model_cfg, **kw)["AP"]
        sharded = predicts_by_gt(va_root, va_ann, model_cfg,
                                 mesh=make_mesh({"data": 8}), **kw)["AP"]
        out["runs"][mtype] = {
            "float_ap": round(float(flat), 4),
            "mesh_sharded_ap": round(float(sharded), 4),
            "delta": round(float(sharded - flat), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps({mtype: out["runs"][mtype]}), flush=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DISCRIM_MESH.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
