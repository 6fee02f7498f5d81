"""The discriminative synthetic corpus (util_synth.make_discriminative_coco)
actually discriminates: perfect predictions score AP 1.0 through the COCOeval,
small sub-pixel-scale errors score strictly inside (0, 1), and the AP is
monotone in the error magnitude — the property the saturated overfit set
lacks (a gate that starts at 1.0 cannot see tenths-of-AP drift)."""

import numpy as np
import pytest

from simple_pose_tpu.metrics.cocoeval import CocoKeypointsGT, KeypointEval
from tests.util_synth import make_discriminative_coco


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
