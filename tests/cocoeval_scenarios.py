"""Deterministic COCOeval corner-case scenarios, shared by the pycocotools
fixture generator (scripts/gen_cocoeval_fixtures.py) and — via the generated
fixture file — tests/test_cocoeval_fixtures.py.

Each scenario is a self-contained (gt dict, results list) pair exercising the
greedy-matching corners where an independent reimplementation of the COCO
keypoint protocol (pycocotools.cocoeval, the reference's evaluator at
/root/reference/metrics/pose_metrics.py:182-209) can silently drift:
crowd absorption, ignore-area interaction, zero-visible gts, duplicate
detections, and randomized mixtures of all four.
"""

import numpy as np

KP_NAMES = [
    "nose", "left_eye", "right_eye", "left_ear", "right_ear",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hip", "right_hip",
    "left_knee", "right_knee", "left_ankle", "right_ankle",
]


def _gt_shell(num_images):
    return {
        "images": [{"id": i + 1, "width": 640, "height": 640} for i in range(num_images)],
        "annotations": [],
        "categories": [{"id": 1, "name": "person", "keypoints": KP_NAMES,
                        "skeleton": []}],
    }


def _person(rng, cx, cy, spread):
    kp = np.zeros((17, 3))
    kp[:, 0] = np.clip(rng.normal(cx, spread, 17), 1, 639)
    kp[:, 1] = np.clip(rng.normal(cy, spread, 17), 1, 639)
    kp[:, 2] = 2
    return kp


def _ann(ann_id, img_id, kp, area, iscrowd=0, num_keypoints=None):
    x0, y0 = float(kp[:, 0].min()) - 3, float(kp[:, 1].min()) - 3
    w, h = float(kp[:, 0].max()) - x0 + 6, float(kp[:, 1].max()) - y0 + 6
    nk = int(np.sum(kp[:, 2] > 0)) if num_keypoints is None else num_keypoints
    out_kp = kp.copy()
    if num_keypoints == 0:
        out_kp[:, 2] = 0
    return {"id": ann_id, "image_id": img_id, "category_id": 1,
            "keypoints": out_kp.reshape(-1).tolist(), "num_keypoints": nk,
            "area": float(area), "bbox": [x0, y0, w, h], "iscrowd": iscrowd}


def _det(img_id, kp, score):
    return {"image_id": img_id, "category_id": 1,
            "keypoints": np.asarray(kp, dtype=float).reshape(-1).tolist(),
            "score": float(score)}


def _jitter(rng, kp, sigma):
    out = kp.copy()
    out[:, :2] += rng.normal(0, sigma, (17, 2))
    return out


def build_scenarios():
    """name -> {"gt": dict, "results": [dict]} (all plain JSON types)."""
    scen = {}

    # 1. crowd absorption: one crowd gt, three stacked detections on it plus
    #    one normal gt with an exact match and a slightly-worse duplicate
    rng = np.random.default_rng(101)
    gt = _gt_shell(2)
    p1 = _person(rng, 200, 200, 40)
    pc = _person(rng, 450, 450, 50)
    gt["annotations"] = [_ann(1, 1, p1, 2500.0),
                         _ann(2, 1, pc, 4000.0, iscrowd=1),
                         _ann(3, 2, _person(rng, 300, 300, 45), 3000.0)]
    res = [_det(1, p1, 0.9), _det(1, _jitter(rng, p1, 2.0), 0.85),
           _det(1, pc, 0.8), _det(1, _jitter(rng, pc, 1.0), 0.75),
           _det(1, _jitter(rng, pc, 3.0), 0.7),
           _det(2, _person(rng, 100, 100, 30), 0.6)]
    scen["crowd_absorption"] = {"gt": gt, "results": res}

    # 2. ignore-area interplay: gts straddling the medium/large boundary
    #    (32^2..96^2 vs >96^2) with matching + area-mismatched detections
    rng = np.random.default_rng(202)
    gt = _gt_shell(2)
    small = _person(rng, 100, 100, 8)     # area ~ just above 32^2
    med = _person(rng, 300, 300, 20)
    large = _person(rng, 500, 400, 60)
    gt["annotations"] = [_ann(1, 1, small, 33.0**2), _ann(2, 1, med, 60.0**2),
                         _ann(3, 2, large, 150.0**2)]
    res = [_det(1, small, 0.95), _det(1, _jitter(rng, med, 4.0), 0.9),
           _det(2, large, 0.85), _det(2, _jitter(rng, large, 100.0), 0.5)]
    scen["ignore_area"] = {"gt": gt, "results": res}

    # 3. zero-visible gts: num_keypoints=0 annotations must be ignore
    #    regions, absorbing exact-position dets without counting
    rng = np.random.default_rng(303)
    gt = _gt_shell(1)
    pz = _person(rng, 200, 300, 35)
    pv = _person(rng, 450, 200, 35)
    gt["annotations"] = [_ann(1, 1, pz, 3000.0, num_keypoints=0),
                         _ann(2, 1, pv, 3000.0)]
    res = [_det(1, pz, 0.9), _det(1, pv, 0.8), _det(1, _jitter(rng, pz, 1.0), 0.7)]
    scen["zero_visible_gt"] = {"gt": gt, "results": res}

    # 4. duplicate detections: exact dup pairs at different score orders,
    #    plus more detections than gts (FP tail) to stress maxDets=20 sort
    rng = np.random.default_rng(404)
    gt = _gt_shell(1)
    people = [_person(rng, 120 + 130 * i, 150 + 90 * (i % 2), 30) for i in range(4)]
    gt["annotations"] = [_ann(i + 1, 1, p, 2800.0) for i, p in enumerate(people)]
    res = []
    for i, p in enumerate(people):
        res.append(_det(1, p, 0.9 - 0.05 * i))
        res.append(_det(1, _jitter(rng, p, 0.5), 0.91 - 0.05 * i))  # dup OUTSCORES true
    res += [_det(1, _person(rng, 550, 550, 20), 0.3 - 0.01 * k) for k in range(6)]
    scen["duplicate_detections"] = {"gt": gt, "results": res}

    # 5-7. randomized mixed scenes: crowds + zero-kp + dupes + area spread +
    #      graded jitter, different seeds (the brute-force-matcher stressors)
    for seed in (5, 6, 7):
        rng = np.random.default_rng(seed * 1000)
        n_img = 4
        gt = _gt_shell(n_img)
        res = []
        aid = 1
        for img_id in range(1, n_img + 1):
            for _ in range(int(rng.integers(1, 5))):
                spread = float(rng.uniform(8, 60))
                p = _person(rng, rng.uniform(80, 560), rng.uniform(80, 560), spread)
                kind = rng.uniform()
                iscrowd = 1 if kind < 0.2 else 0
                nk = 0 if 0.2 <= kind < 0.35 else None
                gt["annotations"].append(
                    _ann(aid, img_id, p, float(rng.uniform(900, 16000)),
                         iscrowd=iscrowd, num_keypoints=nk))
                aid += 1
                for _ in range(int(rng.integers(0, 3))):
                    res.append(_det(img_id, _jitter(rng, p, float(rng.uniform(0, 25))),
                                    float(rng.uniform(0.05, 0.99))))
            if rng.uniform() < 0.5:  # pure false positive
                res.append(_det(img_id, _person(rng, 600, 60, 10),
                                float(rng.uniform(0.05, 0.9))))
        scen[f"mixed_random_{seed}"] = {"gt": gt, "results": res}

    return scen
