"""Map held-out AP vs corpus hardness for the discriminative-AP drive.

The drive's first full run (train: 1-person discs, scale 10-16, no occlusion;
val: 2-person, scale 6.5-22, occlude 0.18) memorized train (AP 1.0) but
scored EXACTLY 0.0 on the hard val corpus at every checkpoint -- the val
recipe jumped past the model's generalization envelope in four knobs at
once.  This probe reuses that trained checkpoint and sweeps each hardness
knob SEPARATELY from the train recipe, so the drive can pick a val corpus
where float AP lands strictly inside (0.2, 0.98).

    DISCRIM_CKPT=/tmp/discrim_xxx/weights/pose_resnet_dconv_last \
        python scripts/probe_discrim_hardness.py

Writes PROBE_DISCRIM_HARDNESS.json at the repo root.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# train-recipe baseline (drive_discrim_ap.py): everything defaults to this,
# each grid row overrides ONE knob (last row = the drive's val recipe).
BASE = dict(num_images=24, people_per_image=1, scale_range=(10.0, 16.0),
            occlude_frac=0.0, blob_sigma=2.5, joint_sep=7.0,
            img_w=160, img_h=128)
GRID = [
    ("heldout_same", {}),
    ("scale_8_18", {"scale_range": (8.0, 18.0)}),
    ("scale_6.5_22", {"scale_range": (6.5, 22.0)}),
    ("occlude_0.06", {"occlude_frac": 0.06}),
    ("occlude_0.12", {"occlude_frac": 0.12}),
    ("sigma_3.0", {"blob_sigma": 3.0}),
    ("people_2", {"people_per_image": 2}),
    ("val_recipe", {"scale_range": (8.0, 18.0), "occlude_frac": 0.12}),
]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.evalkit.workflows import predicts_by_gt
    from tests.util_synth import make_discriminative_coco

    ckpt = os.environ["DISCRIM_CKPT"]
    model_cfg = {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17}
    amp = jax.default_backend() == "tpu"
    tmp = tempfile.mkdtemp(prefix="discrim_probe_")
    out = {"backend": jax.default_backend(), "ckpt": ckpt, "rows": {}}
    t0 = time.perf_counter()
    for name, over in GRID:
        root, ann, _ = make_discriminative_coco(
            os.path.join(tmp, name), seed=777, **{**BASE, **over})
        ap = predicts_by_gt(root, ann, model_cfg, weights=ckpt, batch_size=32,
                            input_shape=(64, 64), canvas=224, amp=amp,
                            out_path=os.path.join(tmp, name, "res.json"))["AP"]
        out["rows"][name] = round(float(ap), 4)
        print(json.dumps({name: out["rows"][name]}), flush=True)
    out["wall_s"] = round(time.perf_counter() - t0, 1)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PROBE_DISCRIM_HARDNESS.json"), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
