"""Discriminative-AP gate for the fused layer1 Pallas path (docs/PERF.md
round 4): re-evaluate the saved HRNet discrim checkpoint with
``fused_layer1=True`` vs the plain evaluator on the held-out corpus, where
float AP sits strictly below 1.0 (~0.81) — so BN-folding/kernel drift is
measured against a target that can actually move.

HRNet is the only discrim family that qualifies (the resnet drives train
resnet18 = BasicBlock trunks, which don't fold; the resnet50 Bottleneck
path is pinned by tests/test_pallas_bottleneck.py instead).

    python scripts/drive_discrim_fusedl1.py /tmp/discrim_ivytbkt4

On the chip this runs the real Pallas kernel; on CPU it runs interpret
mode (slow but identical math).  Writes DISCRIM_FUSEDL1.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.workflows import predicts_by_gt

    run_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/discrim_ivytbkt4"
    model_cfg = {"type": "pose_hrnet", "name": "w32", "num_joints": 17}
    kw = dict(weights=os.path.join(run_dir, "weights", "pose_hrnet_last"),
              batch_size=32, input_shape=(128, 128), canvas=224,
              out_path=os.path.join(run_dir, "res_fusedl1.json"))
    va_root = os.path.join(run_dir, "val", "imgs")
    va_ann = os.path.join(run_dir, "val", "ann.json")
    t0 = time.perf_counter()
    flat = predicts_by_gt(va_root, va_ann, model_cfg, **kw)["AP"]
    fused = predicts_by_gt(va_root, va_ann, model_cfg, fused_layer1=True, **kw)["AP"]
    out = {
        "backend": jax.default_backend(),
        "float_ap": round(float(flat), 4),
        "fused_layer1_ap": round(float(fused), 4),
        "delta": round(float(fused - flat), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "DISCRIM_FUSEDL1.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
