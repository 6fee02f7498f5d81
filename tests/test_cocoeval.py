"""COCO keypoint evaluator: handcrafted scenarios with known AP/AR."""

import numpy as np

from simple_pose_tpu.metrics.cocoeval import CocoKeypointsGT, KeypointEval, evaluate_map


def _make_gt(num_images=4, joints_scale=100.0, area=3000.0, seed=0):
    rng = np.random.default_rng(seed)
    images, annotations = [], []
    ann_id = 1
    store = {}
    for img_id in range(1, num_images + 1):
        images.append({"id": img_id, "width": 640, "height": 480})
        kp = np.zeros((17, 3))
        kp[:, 0] = rng.uniform(100, 100 + joints_scale, 17)
        kp[:, 1] = rng.uniform(100, 100 + joints_scale, 17)
        kp[:, 2] = 2
        annotations.append(
            {
                "id": ann_id,
                "image_id": img_id,
                "category_id": 1,
                "keypoints": kp.reshape(-1).tolist(),
                "num_keypoints": 17,
                "area": area,
                "bbox": [100, 100, joints_scale, joints_scale],
                "iscrowd": 0,
            }
        )
        store[img_id] = kp
        ann_id += 1
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    return gt, store


def _result(img_id, kp, score):
    out = kp.copy()
    out[:, 2] = score
    return {"image_id": img_id, "category_id": 1, "keypoints": out.reshape(-1).tolist(), "score": score}


def _run(gt, results):
    ev = KeypointEval(CocoKeypointsGT(gt), results)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize()


def test_perfect_predictions_give_ap_1():
    gt, store = _make_gt()
    results = [_result(i, store[i], 0.9) for i in store]
    stats = _run(gt, results)
    assert stats["AP"] == 1.0
    assert stats["AR"] == 1.0
    assert stats["Ap .5"] == 1.0


def test_no_predictions_give_ap_0():
    gt, _ = _make_gt()
    stats = _run(gt, [])
    assert stats["AP"] == 0.0
    assert stats["AR"] == 0.0


def test_half_detected():
    gt, store = _make_gt(num_images=4)
    results = [_result(i, store[i], 0.9) for i in list(store)[:2]]
    stats = _run(gt, results)
    # recall caps at 0.5; with no false positives precision is 1 up to 0.5
    assert abs(stats["AR"] - 0.5) < 1e-9
    assert 0.49 < stats["AP"] < 0.51


def test_false_positive_lowers_ap():
    gt, store = _make_gt()
    results = [_result(i, store[i], 0.9) for i in store]
    junk = store[1].copy()
    junk[:, :2] += 10000
    base = _run(gt, list(results))["AP"]
    with_fp_low = _run(gt, results + [_result(1, junk, 0.1)])["AP"]
    with_fp_high = _run(gt, results + [_result(1, junk, 0.99)])["AP"]
    assert with_fp_low == base  # FP ranked last doesn't change interpolated AP
    assert with_fp_high < base


def test_jittered_predictions_degrade_gracefully():
    gt, store = _make_gt(num_images=8, seed=1)
    rng = np.random.default_rng(2)
    results = []
    for i, kp in store.items():
        noisy = kp.copy()
        noisy[:, :2] += rng.normal(0, 4.0, size=(17, 2))
        results.append(_result(i, noisy, 0.9))
    stats = _run(gt, results)
    assert 0.0 < stats["AP"] < 1.0


def test_crowd_gt_is_ignored():
    gt, store = _make_gt()
    for ann in gt["annotations"]:
        if ann["image_id"] == 1:
            ann["iscrowd"] = 1
    results = [_result(i, store[i], 0.9) for i in list(store)[1:]]  # skip img 1
    stats = _run(gt, results)
    assert stats["AP"] == 1.0  # missing the crowd gt costs nothing


def test_zero_keypoint_gt_is_ignored():
    gt, store = _make_gt()
    gt["annotations"][0]["num_keypoints"] = 0
    results = [_result(i, store[i], 0.9) for i in list(store)[1:]]
    stats = _run(gt, results)
    assert stats["AP"] == 1.0


def test_area_partition():
    # one small-ish (medium) gt and one large gt
    gt, store = _make_gt(num_images=2)
    gt["annotations"][0]["area"] = 50.0**2  # medium
    gt["annotations"][1]["area"] = 200.0**2  # large
    results = [_result(i, store[i], 0.9) for i in store]
    stats = _run(gt, results)
    assert abs(stats["AP (M)"] - 1.0) < 1e-9
    assert abs(stats["AP (L)"] - 1.0) < 1e-9


def test_evaluate_map_accepts_paths(tmp_path):
    import json

    gt, store = _make_gt()
    results = [_result(i, store[i], 0.9) for i in store]
    gt_path = tmp_path / "gt.json"
    res_path = tmp_path / "res.json"
    gt_path.write_text(json.dumps(gt))
    res_path.write_text(json.dumps(results))
    stats = evaluate_map(str(res_path), str(gt_path))
    assert stats["AP"] == 1.0


def test_maxdets_cap():
    gt, store = _make_gt(num_images=1)
    results = [_result(1, store[1], 0.9)]
    # 30 junk detections above maxDets=20 shouldn't crash and should rank below
    junk = store[1].copy()
    junk[:, :2] += 5000
    for k in range(30):
        results.append(_result(1, junk, 0.5 - 0.001 * k))
    stats = _run(gt, results)
    assert stats["AR"] == 1.0


def test_duplicate_detections_second_becomes_fp():
    """Greedy matching: the higher-scored duplicate matches the gt, the
    second becomes a false positive that drags precision."""
    gt, store = _make_gt(num_images=2)
    results = [_result(i, store[i], 0.9) for i in store]
    dup = store[1].copy()
    dup[:, :2] += 1.0  # near-duplicate of image 1's gt
    stats_clean = _run(gt, list(results))
    stats_dup = _run(gt, results + [_result(1, dup, 0.95)])
    assert stats_dup["AP"] < stats_clean["AP"]
    assert abs(stats_dup["AR"] - stats_clean["AR"]) < 1e-9  # recall unharmed


def test_crowd_gt_absorbs_extra_detections():
    """iscrowd gts can match multiple detections without penalty."""
    gt, store = _make_gt(num_images=2)
    gt["annotations"][0]["iscrowd"] = 1  # image 1 becomes crowd
    results = [_result(2, store[2], 0.9)]
    # two detections on the crowd region: both should be ignored, not FPs
    results.append(_result(1, store[1], 0.95))
    near = store[1].copy()
    near[:, :2] += 1.0
    results.append(_result(1, near, 0.85))
    stats = _run(gt, results)
    assert abs(stats["AP"] - 1.0) < 1e-9
