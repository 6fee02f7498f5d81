"""Fused detect->crop->pose device program + batched jnp geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_pose_tpu.ops import affine as A
from simple_pose_tpu.ops.affine_jax import affine_crop_separable_multi, boxes_to_crop_affines
from simple_pose_tpu.ops.warp import affine_crop_separable


def test_boxes_to_crop_affines_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(10):
        x1, y1 = rng.uniform(0, 300, 2)
        w, h = rng.uniform(20, 200, 2)
        box = jnp.asarray([x1, y1, x1 + w, y1 + h])
        trans, trans_inv = boxes_to_crop_affines(box, (192, 256), (48, 64))
        c, s = A.box_to_center_scale(x1, y1, w, h, 192 / 256)
        ref_t, _ = A.get_affine_transform(c, s, 0, (192, 256))
        _, ref_ti = A.get_affine_transform(c, s, 0, (48, 64))
        np.testing.assert_allclose(np.asarray(trans), ref_t, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(trans_inv), ref_ti, rtol=1e-4, atol=1e-3)


def test_multi_crop_matches_flat_separable():
    rng = np.random.default_rng(1)
    imgs = np.stack([rng.integers(0, 255, (240, 320, 3), dtype=np.uint8) for _ in range(2)])
    boxes = jnp.asarray(rng.uniform(10, 200, size=(2, 3, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + jnp.abs(boxes[..., 2:]) + 20)
    trans, _ = boxes_to_crop_affines(boxes, (48, 64), (12, 16))
    multi = np.asarray(affine_crop_separable_multi(jnp.asarray(imgs), trans, (64, 48)))
    for b in range(2):
        for p in range(3):
            flat = np.asarray(
                affine_crop_separable(jnp.asarray(imgs[b : b + 1]), trans[b, p][None], (64, 48))
            )[0]
            np.testing.assert_allclose(multi[b, p], flat, atol=1e-3)


def test_fused_program_with_yolov4():
    """detector_family='yolov4' drives detect->crop->pose end to end."""
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    fused = FusedDetectPose(
        {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
        detector_weights=None, scale_name="s", det_size=(256, 256),
        input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=256,
        detector_family="yolov4",
    )
    rng = np.random.default_rng(3)
    canvases = rng.integers(0, 255, size=(1, 256, 256, 3), dtype=np.uint8)
    out = fused(canvases, [(200, 256)])
    assert out["kps"].shape == (1, 4, 17, 2)
    assert np.all(np.isfinite(out["kps"]))


def test_fused_program_end_to_end():
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    fused = FusedDetectPose(
        {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
        detector_weights=None, scale_name="s", det_size=(256, 256),
        input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=256,
    )
    rng = np.random.default_rng(2)
    canvases = rng.integers(0, 255, size=(2, 256, 256, 3), dtype=np.uint8)
    out = fused(canvases, [(200, 256), (256, 192)])
    assert out["kps"].shape == (2, 4, 17, 2)
    assert out["boxes"].shape == (2, 4, 4)
    assert out["det_valid"].shape == (2, 4)
    assert np.all(np.isfinite(out["kps"]))
    # keypoints of valid detections must land inside the source image bounds-ish
    for b in range(2):
        for p in range(4):
            if out["det_valid"][b, p]:
                assert out["boxes"][b, p, 2] >= out["boxes"][b, p, 0]


def test_fused_eval_workflow(tmp_path):
    """fused_eval: dataset-level AP eval through the single fused program --
    predictions follow the detector-box conventions (area = padded-scale
    product, score = det box score) and chain into rescore_and_filter; the
    quant_calib path writes the per-net scales json and reloads."""
    import json

    from simple_pose_tpu.evalkit.fused import fused_eval
    from tests.util_synth import make_synth_coco

    img_root, ann_path, _ = make_synth_coco(str(tmp_path), num_images=5)
    kw = dict(
        pose_model_cfg={"type": "pose_resnet_dconv", "name": "resnet18",
                        "num_joints": 17},
        detector_weights=None, scale_name="s", det_size=(128, 128),
        input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=192,
        batch_size=2, out_path=str(tmp_path / "fused_kps.json"),
    )
    stats = fused_eval(img_root, ann_path, **kw)
    assert "AP" in stats  # random weights -> AP ~ 0; the chain completes
    preds = json.load(open(tmp_path / "fused_kps.json"))
    assert preds, "near-prior det scores at conf 0.001 should yield boxes"
    assert {"kps", "area", "score", "img_id"} <= set(preds[0])
    assert len(preds[0]["kps"]) == 51 and preds[0]["area"] > 0

    scales_path = str(tmp_path / "fused_scales.json")
    stats_q = fused_eval(img_root, ann_path, quant="w8a8", quant_calib=1,
                         quant_scales_out=scales_path, **kw)
    assert "AP" in stats_q
    scales = json.load(open(scales_path))
    assert set(scales) == {"detector", "pose"}
    stats_q2 = fused_eval(img_root, ann_path, quant="w8a8",
                          quant_scales=scales, **kw)
    assert stats_q2["AP"] == stats_q["AP"]
