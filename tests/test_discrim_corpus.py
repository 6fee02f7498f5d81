"""The discriminative synthetic corpus (util_synth.make_discriminative_coco)
actually discriminates: perfect predictions score AP 1.0 through the COCOeval,
small sub-pixel-scale errors score strictly inside (0, 1), and the AP is
monotone in the error magnitude — the property the saturated overfit set
lacks (a gate that starts at 1.0 cannot see tenths-of-AP drift)."""

import os

import numpy as np
import pytest

from simple_pose_tpu.metrics.cocoeval import CocoKeypointsGT, KeypointEval
from tests.util_synth import make_discriminative_coco, make_flipsym_coco


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("discrim")
    return make_discriminative_coco(str(root), num_images=12, seed=777,
                                    scale_range=(6.0, 26.0), occlude_frac=0.18)


def _predict_from_gt(gt, noise_px, seed=0):
    rng = np.random.default_rng(seed)
    results = []
    for ann in gt["annotations"]:
        kp = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        kp[:, :2] += rng.normal(0, noise_px, (17, 2))
        kp[:, 2] = 1.0
        results.append({"image_id": ann["image_id"], "category_id": 1,
                        "keypoints": kp.reshape(-1).tolist(),
                        "score": float(rng.uniform(0.7, 1.0))})
    return results


def _ap(gt, results):
    ev = KeypointEval(CocoKeypointsGT(gt), results)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize()["AP"]


def test_corpus_properties(corpus):
    _, _, gt = corpus
    kps = np.asarray(gt["annotations"][0]["keypoints"]).reshape(17, 3)
    assert np.any(kps[:, 0] != np.round(kps[:, 0])), "joints must be sub-pixel"
    # instance scale sweep: area spread at least 4x
    areas = np.array([a["area"] for a in gt["annotations"]])
    assert areas.max() / areas.min() > 4.0
    assert len(gt["annotations"]) == 2 * len(gt["images"])


def test_ap_is_discriminative(corpus):
    _, _, gt = corpus
    ap_perfect = _ap(gt, _predict_from_gt(gt, 0.0))
    ap_small = _ap(gt, _predict_from_gt(gt, 2.0))
    ap_big = _ap(gt, _predict_from_gt(gt, 6.0))
    assert ap_perfect > 0.999
    assert 0.0 < ap_big < ap_small < 1.0, (ap_perfect, ap_small, ap_big)


# ---------------------------------------------------------------------------
# Flip-symmetric corpus (make_flipsym_coco): the positive flip-test gate's
# corpus must satisfy the properties that make flip-test well-posed.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def flipsym(tmp_path_factory):
    root = tmp_path_factory.mktemp("flipsym")
    return make_flipsym_coco(str(root), num_images=10, seed=321,
                             scale_range=(9.0, 16.0), occlude_frac=0.0)


def _nearest_palette(px, palette):
    d = [np.sum((np.asarray(px, np.float64) - np.asarray(c)) ** 2) for c in palette]
    return int(np.argmin(d))


def _flipsym_palette():
    import cv2 as cv

    return [tuple(int(v) for v in cv.cvtColor(
        np.uint8([[[int(c * 180 / 9), 255, 255]]]), cv.COLOR_HSV2BGR)[0, 0])
        for c in range(9)]


def test_flipsym_pair_colors_and_identifiability(flipsym):
    """Each L/R pair shares one palette color (appearance is mirror-
    invariant) and that color is recoverable at the marker center in the
    SAVED jpeg (the lesson of the 4:2:0 palette failure, util_synth.py)."""
    import cv2 as cv

    img_root, _, gt = flipsym
    palette = _flipsym_palette()
    by_img = {im["id"]: im["file_name"] for im in gt["images"]}
    hits = total = 0
    for ann in gt["annotations"]:
        img = cv.imread(os.path.join(img_root, by_img[ann["image_id"]]))
        kp = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        for j in range(17):
            want = 0 if j == 0 else 1 + (j - 1) // 2
            got = _nearest_palette(
                img[int(round(kp[j, 1])), int(round(kp[j, 0]))], palette)
            hits += got == want
            total += 1
    assert hits / total > 0.92, f"marker identifiability {hits}/{total}"


def test_flipsym_side_convention_and_flip_consistency(flipsym):
    """Left pair members sit strictly at +x of their right sibling (identity
    = layout side, as on real bodies), and a horizontally flipped sample --
    np.fliplr image + flip_joints GT (the exact aug/flip-test semantics,
    joint_utils.py:102-112) -- satisfies the SAME invariant, i.e. flipping
    is in-distribution (what makes flip-test well-posed on this corpus)."""
    from simple_pose_tpu.data.coco import JOINT_PAIRS
    from simple_pose_tpu.ops.affine import flip_joints

    _, _, gt = flipsym
    width = gt["images"][0]["width"]
    for ann in gt["annotations"]:
        kp = np.asarray(ann["keypoints"], np.float64).reshape(17, 3)
        for left, right in JOINT_PAIRS:
            assert kp[left, 0] > kp[right, 0] + 1.0, (left, right)
        kpf = flip_joints(kp, width, JOINT_PAIRS)
        for left, right in JOINT_PAIRS:
            assert kpf[left, 0] > kpf[right, 0] + 1.0, ("flipped", left, right)


def test_flipsym_ap_is_discriminative(flipsym):
    _, _, gt = flipsym
    ap_perfect = _ap(gt, _predict_from_gt(gt, 0.0))
    ap_small = _ap(gt, _predict_from_gt(gt, 2.0))
    ap_big = _ap(gt, _predict_from_gt(gt, 6.0))
    assert ap_perfect > 0.999
    assert 0.0 < ap_big < ap_small < 1.0, (ap_perfect, ap_small, ap_big)


# ---------------------------------------------------------------------------
# Detector-chain corpus + synthetic detections (drive_discrim_detchain):
# the simulator must produce the three populations the rescore/OKS-NMS
# chain exists to handle, deterministically under a seed.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def crowded(tmp_path_factory):
    root = tmp_path_factory.mktemp("crowded")
    return make_flipsym_coco(str(root), num_images=8, seed=777,
                             img_w=256, img_h=192, people_per_image=[3, 4] * 4,
                             scale_range=(9.0, 13.0), min_center_sep=1.7)


def test_crowded_boxes_overlap(crowded):
    """The crowded knobs (3-4 people on 256x192) must actually produce
    overlapping person boxes: min_center_sep only FLOORS the separation,
    density creates the overlaps (the regime where OKS-NMS has work)."""
    _, _, gt = crowded
    by_img = {}
    for a in gt["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a["bbox"])
    n_overlap = 0
    for boxes in by_img.values():
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                ax, ay, aw, ah = boxes[i]
                bx, by, bw, bh = boxes[j]
                ix = min(ax + aw, bx + bw) - max(ax, bx)
                iy = min(ay + ah, by + bh) - max(ay, by)
                n_overlap += (ix > 0) and (iy > 0)
    assert n_overlap >= len(by_img), f"only {n_overlap} overlapping pairs"


def test_synth_detections_populations(crowded):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "drive_discrim_detchain",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "scripts", "drive_discrim_detchain.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    _, _, gt = crowded
    dets, stats = mod.synth_detections(gt, seed=2025)
    dets2, _ = mod.synth_detections(gt, seed=2025)
    assert dets == dets2, "simulator must be deterministic under a seed"
    assert stats["true"] == len(gt["annotations"])
    assert stats["dup"] >= len(gt["annotations"])          # >=1 duplicate each
    assert stats["fp"] == 2 * len(gt["images"])
    assert len(dets) == stats["true"] + stats["dup"] + stats["fp"]
    scores = np.array([d["score"] for d in dets])
    assert scores.min() > 0.0 and scores.max() < 1.0
    # false positives must be able to OUTRANK true boxes on raw box score
    # (what makes the rescore stage load-bearing)
    fps = scores[-stats["fp"]:]
    assert fps.max() > 0.85
    for d in dets:
        x, y, w, h = d["bbox"]
        assert w > 0 and h > 0
