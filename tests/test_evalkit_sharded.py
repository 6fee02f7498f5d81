"""Mesh-sharded eval workflows == single-device results (8 virtual devices).

The reference benchmarks its eval paths single-GPU (eval.py:101-150); the
TPU rebuild shards the batch axis of PoseEvaluator / FusedDetectPose /
YOLOv5Detector over the mesh so a v5e slice uses every chip.  These tests
pin that the sharded programs compute EXACTLY what the single-device ones
do (same math, different partitioning).
"""

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.data.coco import load_coco_keypoints
from simple_pose_tpu.data.pipeline import PosePipeline
from simple_pose_tpu.evalkit.workflows import PoseEvaluator, predicts_by_gt
from simple_pose_tpu.parallel.mesh import make_mesh
from tests.util_synth import make_synth_coco

MODEL_CFG = {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17}


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    return make_synth_coco(str(root), num_images=8)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh({"data": 8})


def _batch(synth, batch_size=8, dedup_buckets=0):
    img_root, ann_path, _ = synth
    recs = load_coco_keypoints(img_root, ann_path)
    kw = {}
    if dedup_buckets:
        kw = {"dedup_canvases": 8, "dedup_buckets": dedup_buckets}
    pipe = PosePipeline(recs, batch_size, input_shape=(64, 64), output_shape=(16, 16),
                        canvas=192, augment=False, shuffle=False, drop_last=False, **kw)
    return next(iter(pipe.epoch(0)))


def _assert_outputs_close(out1, out8):
    np.testing.assert_allclose(np.asarray(out8["kps"]), np.asarray(out1["kps"]), atol=0.1)
    np.testing.assert_allclose(np.asarray(out8["conf"]), np.asarray(out1["conf"]),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out8["scores"]), np.asarray(out1["scores"]),
                               rtol=1e-3)


def test_pose_evaluator_sharded_equals_single(synth, mesh8):
    batch = _batch(synth)
    ev1 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=None)
    ev8 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=None, mesh=mesh8)
    out1 = ev1(batch)
    out8 = ev8(batch)
    # per-shard XLA scheduling perturbs conv sums at ~1e-4 relative; the
    # decode Newton step amplifies that to sub-pixel (<0.1px) coordinate
    # noise -- assert sub-pixel agreement, exact wiring
    _assert_outputs_close(out1, out8)
    # the sharded step really places the batch over all 8 devices
    assert len(out8["kps"].sharding.device_set) == 8


def test_pose_evaluator_sharded_dedup_gather(synth, mesh8):
    """canvas-dedup batches use the bucket-local shard_map gather under a
    mesh; results must match the single-device dedup path.  Bucket-local
    (8-bucket) packing may order crops differently than the global (1-bucket)
    packing, so results are aligned by img_id."""
    batch8 = _batch(synth, dedup_buckets=8)
    batch1 = _batch(synth, dedup_buckets=1)
    assert "canvas_idx" in batch8 and "canvas_idx" in batch1
    ev1 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=None)
    ev8 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=None, mesh=mesh8)
    out1 = ev1(batch1)
    out8 = ev8(batch8)
    o1 = np.argsort(batch1["img_id"], kind="stable")
    o8 = np.argsort(batch8["img_id"], kind="stable")
    np.testing.assert_array_equal(batch1["img_id"][o1], batch8["img_id"][o8])
    np.testing.assert_allclose(np.asarray(out8["kps"])[o8],
                               np.asarray(out1["kps"])[o1], atol=0.1)
    np.testing.assert_allclose(np.asarray(out8["scores"])[o8],
                               np.asarray(out1["scores"])[o1], rtol=1e-3)


def test_predicts_by_gt_sharded_equals_single(synth, mesh8, tmp_path):
    """Whole GT-box workflow under a mesh: same AP and same result dicts."""
    img_root, ann_path, _ = synth
    common = dict(weights=None, batch_size=8, input_shape=(64, 64), canvas=192)
    stats1 = predicts_by_gt(img_root, ann_path, MODEL_CFG,
                            out_path=str(tmp_path / "r1.json"), **common)
    stats8 = predicts_by_gt(img_root, ann_path, MODEL_CFG, mesh=mesh8,
                            out_path=str(tmp_path / "r8.json"), **common)
    import json

    r1 = json.load(open(tmp_path / "r1.json"))
    r8 = json.load(open(tmp_path / "r8.json"))
    assert len(r1) == len(r8) == 8
    for a, b in zip(r1, r8):
        assert a["image_id"] == b["image_id"]
        np.testing.assert_allclose(a["keypoints"], b["keypoints"], atol=0.1)
        np.testing.assert_allclose(a["score"], b["score"], rtol=1e-3)
    assert stats1["AP"] == pytest.approx(stats8["AP"], abs=1e-3)


def test_fused_detect_pose_sharded_equals_single(mesh8):
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    cfg = dict(pose_model_cfg=MODEL_CFG, detector_weights=None, scale_name="s",
               det_size=(256, 256), input_shape=(64, 64), max_people=4,
               det_conf=0.001, canvas=256, amp=None)
    fused1 = FusedDetectPose(**cfg)
    fused8 = FusedDetectPose(**cfg, mesh=mesh8)
    rng = np.random.default_rng(7)
    canvases = rng.integers(0, 255, size=(8, 256, 256, 3), dtype=np.uint8)
    shapes = [(200, 256)] * 4 + [(256, 192)] * 4
    out1 = fused1(canvases, shapes)
    out8 = fused8(canvases, shapes)
    assert set(out1) == set(out8)
    np.testing.assert_array_equal(out8["det_valid"], out1["det_valid"])
    # padded/invalid detection slots hold garbage geometry whose decode
    # amplifies shard noise arbitrarily -- compare valid slots only
    mask = out1["det_valid"]
    # rtol=0.1 tolerates degenerate random-weight boxes whose inverse
    # geometry maps shard noise to huge coordinates; real agreement is the
    # atol=0.2 bulk plus the exact det_valid match above
    for k in ("boxes", "det_scores", "kps", "kp_conf", "pose_scores"):
        np.testing.assert_allclose(out8[k][mask], out1[k][mask], atol=0.2, rtol=0.1)


def test_detector_wrapper_sharded_equals_single(mesh8):
    from simple_pose_tpu.detector.wrapper import YOLOv5Detector, paste_with_border

    cfg = dict(weights_path=None, scale_name="s", scale_size=(256, 256),
               conf_thresh=0.01, canvas=512)
    det1 = YOLOv5Detector(**cfg)
    det8 = YOLOv5Detector(**cfg, mesh=mesh8)
    rng = np.random.default_rng(9)
    canvases = np.zeros((8, 512, 512, 3), np.uint8)
    shapes = []
    for i in range(8):
        h, w = int(rng.integers(200, 500)), int(rng.integers(200, 500))
        paste_with_border(canvases[i], rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        shapes.append((h, w))
    b1 = det1.predict_batch(canvases, shapes)
    b8 = det8.predict_batch(canvases, shapes)
    for a, b in zip(b1, b8):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)


def test_pose_evaluator_sharded_quant(synth, mesh8):
    """quant='w8a8' composes with the mesh: int8 convs on every shard,
    same results as the single-device quantized program (integer conv math
    is exactly partition-invariant; only the float dequant scale rounds)."""
    batch = _batch(synth)
    ev1 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=None, quant="w8a8")
    ev8 = PoseEvaluator(MODEL_CFG, None, (64, 64), amp=None, mesh=mesh8,
                        quant="w8a8")
    _assert_outputs_close(ev1(batch), ev8(batch))
