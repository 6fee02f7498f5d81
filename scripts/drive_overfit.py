"""Full-framework convergence drive: train PoseSolver end to end on a
synthetic marker set until validation AP reaches 1.0.

Exercises, in one real training loop, the host pipeline (canvas dedup),
the device crop (Pallas on TPU / MXU on CPU), encode, model fwd+bwd, the
3-group optimizer, EMA, sharded validation, decode and COCOeval — the
round-1 "full-solver overfit" validation as a repeatable artifact.

    python scripts/drive_overfit.py            # TPU (or ambient backend)
    OVERFIT_EPOCHS=8 python scripts/drive_overfit.py
    # reference optional optimizer stack (optims_utils.py:35-87): 3-group
    # split + bias 0.1->lr warmup + warmup-cosine-multistep schedule
    OVERFIT_SPLIT_GROUPS=1 OVERFIT_SCHEDULE=warmup_cosine_multistep \
        OVERFIT_OUT=OVERFIT_SPLIT.json python scripts/drive_overfit.py
    # OVERFIT_QUANT=1: after convergence, save the checkpoint and re-eval it
    # through the standalone GT workflow in float AND w8a8 -- trained-model
    # accuracy evidence for the int8 serving path (models/quant.py)

Writes OVERFIT.json (or $OVERFIT_OUT) at the repo root: backend, config,
per-epoch AP, wall time.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.train.config import load_config
    from simple_pose_tpu.train.solver import PoseSolver
    from tests.util_synth import make_synth_coco

    epochs = int(os.environ.get("OVERFIT_EPOCHS", 600))
    val_every = int(os.environ.get("OVERFIT_VAL_EVERY", 100))
    # e.g. OVERFIT_MODEL=pose_hrnet:w32 to drive the HRNet family end to end
    mtype, mname = os.environ.get("OVERFIT_MODEL", "pose_resnet_dconv:resnet18").split(":")
    tmp = tempfile.mkdtemp(prefix="overfit_")
    img_root, ann_path, _ = make_synth_coco(tmp, num_images=16, paint_markers=True)
    cfg = load_config({
        "model_name": "overfit_drive",
        "data": {
            "train_ann_path": ann_path, "val_ann_path": ann_path,
            "train_img_root": img_root, "val_img_root": img_root,
            "batch_size": 16, "num_workers": 2, "canvas": 192,
            "input_shape": [64, 64],
            # memorization setup: no augmentation (the round-1 drive's
            # configuration) -- the point is end-to-end learnability of the
            # crop->encode->model->decode->COCOeval chain, not aug robustness
            "augment": False,
        },
        "model": {"type": mtype, "name": mname, "num_joints": 17},
        "optim": {"lr": 1e-3, "milestones": [max(2, epochs - 100)], "epochs": epochs,
                  "gamma": 0.1, "amp": jax.default_backend() == "tpu",
                  "split_groups": os.environ.get("OVERFIT_SPLIT_GROUPS", "0") == "1",
                  "schedule": os.environ.get("OVERFIT_SCHEDULE", "multistep"),
                  "warm_up_epoch": int(os.environ.get("OVERFIT_WARMUP_EPOCHS", 10))},
        "val": {"interval": 1, "weight_path": os.path.join(tmp, "weights")},
        "mesh": {"data": len(jax.devices())},
        "seed": 11,
    })
    solver = PoseSolver(cfg)
    solver.init_state()
    t0 = time.perf_counter()
    ap_by_epoch = {}
    last_ep = 0
    for ep in range(epochs):
        solver.train_epoch(ep, log_every=10**9)
        last_ep = ep
        if (ep + 1) % val_every and ep != epochs - 1:
            continue
        stats = solver.validate(ep, results_path=os.path.join(tmp, "val.json"))
        ap_by_epoch[ep + 1] = round(float(stats["AP"]), 4)
        print(json.dumps({"epoch": ep, "AP": ap_by_epoch[ep + 1]}), flush=True)
        if ap_by_epoch[ep + 1] >= 0.999:
            break
    final_ap = ap_by_epoch[max(ap_by_epoch)]
    quant_eval = None
    if os.environ.get("OVERFIT_QUANT", "0") == "1":
        from simple_pose_tpu.evalkit.workflows import predicts_by_gt

        solver.save_checkpoint(last_ep, final_ap)
        ckpt = os.path.join(tmp, "weights", f"{mtype}_best")
        # exactly the training cfg's model block (no SE: 'reduction' unset)
        model_cfg = {"type": mtype, "name": mname, "num_joints": 17}
        kw = dict(weights=ckpt, batch_size=16, input_shape=(64, 64),
                  canvas=192, out_path=os.path.join(tmp, "q.json"),
                  amp=jax.default_backend() == "tpu")
        ap_f = predicts_by_gt(img_root, ann_path, model_cfg, **kw)["AP"]
        ap_q = predicts_by_gt(img_root, ann_path, model_cfg, quant="w8a8", **kw)["AP"]
        # static calibrated scales (the deployed serving config): calibrate
        # on the first batch, eval the fully static int8 program
        ap_qs = predicts_by_gt(img_root, ann_path, model_cfg, quant="w8a8",
                               quant_calib=1, **kw)["AP"]
        quant_eval = {"float_ap": round(float(ap_f), 4),
                      "w8a8_ap": round(float(ap_q), 4),
                      "w8a8_static_ap": round(float(ap_qs), 4)}
        print(json.dumps({"quant_eval": quant_eval}), flush=True)
    out = {
        "backend": jax.default_backend(),
        "model": f"{mtype}:{mname}",
        "optim": {"split_groups": cfg.optim.split_groups, "schedule": cfg.optim.schedule},
        "devices": len(jax.devices()),
        "epochs_run": last_ep + 1,
        "steps_per_epoch": 1,
        "ap_by_epoch": ap_by_epoch,
        "final_ap": final_ap,
        "wall_s": round(time.perf_counter() - t0, 1),
        "reached_1_0": bool(final_ap >= 0.999),
    }
    if quant_eval is not None:
        out["quant_eval"] = quant_eval
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           os.environ.get("OVERFIT_OUT", "OVERFIT.json")), "w") as f:
        json.dump(out, f)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
