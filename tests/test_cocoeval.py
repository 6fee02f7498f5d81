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


# ---------------------------------------------------------------------------
# Hand-derived golden fixture + first-principles brute-force property test
# (pins crowd/ignore/area-range interactions, cocoeval.py matching protocol)
# ---------------------------------------------------------------------------

def _kp(x0, y0, spread=60.0, n=17):
    kp = np.zeros((n, 3))
    kp[:, 0] = np.linspace(x0, x0 + spread, n)
    kp[:, 1] = np.linspace(y0, y0 + spread, n)
    kp[:, 2] = 2
    return kp


def test_hand_derived_crowd_ignore_area_golden():
    """A fully hand-computed scenario:

    img 1: G1 normal (area 2500 -> medium), D_fp far away (score .95),
           D_tp exact match (score .90)
    img 2: G2 iscrowd=1 + TWO exact-match dets (.70, .60) -> both absorbed
           and ignored (crowd gts stay matchable)
           G3 num_keypoints=0 + one exact-position det (.50) -> ignored
    npig = 1 (only G1 counts).  Sorted dets: fp, tp, (3 ignored).
    tp/fp cumsums per threshold: tps=[0,1], fps=[1,0] ->
    rc=[0,1], pr=[0,.5] -> monotone [.5,.5] -> AP = .5 at every
    threshold and every recall point; AR = 1.0.
    Large range: G1 (2500 < 96^2) ignored -> npig=0 -> AP(L) = -1.
    """
    g1 = _kp(100, 100)
    g2 = _kp(300, 300)
    g3 = _kp(100, 100)
    gt = {
        "images": [{"id": 1, "width": 640, "height": 480}, {"id": 2, "width": 640, "height": 480}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1, "keypoints": g1.reshape(-1).tolist(),
             "num_keypoints": 17, "area": 2500.0, "bbox": [100, 100, 50, 50], "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 1, "keypoints": g2.reshape(-1).tolist(),
             "num_keypoints": 17, "area": 2500.0, "bbox": [300, 300, 50, 50], "iscrowd": 1},
            {"id": 3, "image_id": 2, "category_id": 1, "keypoints": (g3 * 0).reshape(-1).tolist(),
             "num_keypoints": 0, "area": 2500.0, "bbox": [100, 100, 50, 50], "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "person"}],
    }
    results = [
        _result(1, _kp(5000, 5000), 0.95),  # fp: OKS ~ exp(-huge) = 0
        _result(1, g1, 0.90),               # tp: OKS = 1
        _result(2, g2, 0.70),               # crowd-absorbed -> ignored
        _result(2, g2, 0.60),               # crowd absorbs AGAIN -> ignored
        _result(2, g3, 0.50),               # matches zero-kp ignore gt
    ]
    stats = _run(gt, results)
    assert abs(stats["AP"] - 0.5) < 1e-9
    assert abs(stats["Ap .5"] - 0.5) < 1e-9
    assert abs(stats["AP .75"] - 0.5) < 1e-9
    assert abs(stats["AR"] - 1.0) < 1e-9
    assert abs(stats["AP (M)"] - 0.5) < 1e-9
    assert stats["AP (L)"] == -1.0


# ------------------------------ brute-force first-principles implementation
def _bf_oks(dt_kps, gt):
    """Published OKS: mean over gt-visible joints of exp(-d^2 / (2 s^2 k^2)),
    k = 2*sigma, s^2 = gt area.  Zero-visible gts (crowds/zero-kp) use the
    distance to the doubled gt box instead of per-joint distances."""
    from simple_pose_tpu.ops.oks import COCO_SIGMAS

    g = np.asarray(gt["keypoints"], dtype=np.float64).reshape(-1, 3)
    d = np.asarray(dt_kps, dtype=np.float64).reshape(-1, 3)
    vis = g[:, 2] > 0
    kk = (2.0 * COCO_SIGMAS) ** 2
    if vis.any():
        dx = d[:, 0] - g[:, 0]
        dy = d[:, 1] - g[:, 1]
    else:
        bx, by, bw, bh = gt["bbox"]
        x0, x1 = bx - bw, bx + 2 * bw
        y0, y1 = by - bh, by + 2 * bh
        dx = np.maximum(0.0, x0 - d[:, 0]) + np.maximum(0.0, d[:, 0] - x1)
        dy = np.maximum(0.0, y0 - d[:, 1]) + np.maximum(0.0, d[:, 1] - y1)
        vis = np.ones(len(d), bool)
    e = (dx**2 + dy**2) / kk / (gt["area"] + np.spacing(1)) / 2.0
    return float(np.mean(np.exp(-e[vis])))


def _bf_eval(gt_data, results, max_dets=20):
    """Independent re-derivation of the COCO keypoint protocol in plain
    loops/sets: greedy per-threshold matching (crowd gts reusable, prefer
    non-ignored gts), then AP from the definition 'mean over 101 recall
    thresholds of the max precision among detections achieving recall >=
    thr', AR = final recall."""
    iou_thrs = np.linspace(0.5, 0.95, 10)
    area_rngs = {"all": (0.0, 1e10), "medium": (32.0**2, 96.0**2), "large": (96.0**2, 1e10)}
    imgs = [img["id"] for img in gt_data["images"]]
    gts_by_img = {i: [a for a in gt_data["annotations"] if a["image_id"] == i] for i in imgs}
    dts_by_img = {i: [] for i in imgs}
    for r in results:
        if r["image_id"] in dts_by_img:
            dts_by_img[r["image_id"]].append(r)

    def dt_area(r):
        k = np.asarray(r["keypoints"], dtype=np.float64).reshape(-1, 3)
        return float((k[:, 0].max() - k[:, 0].min()) * (k[:, 1].max() - k[:, 1].min()))

    stats = {}
    for aname, (lo, hi) in area_rngs.items():
        npig = 0
        per_thr = {t: [] for t in range(len(iou_thrs))}  # (score, is_tp, is_ignored)
        for i in imgs:
            gts = gts_by_img[i]
            dts = sorted(dts_by_img[i], key=lambda d: -d["score"])[:max_dets]
            gig = {
                id(g): bool(
                    g.get("iscrowd", 0) or g.get("num_keypoints", 0) == 0
                    or g["area"] < lo or g["area"] > hi
                )
                for g in gts
            }
            npig += sum(1 for g in gts if not gig[id(g)])
            oks = {(di, id(g)): _bf_oks(d["keypoints"], g)
                   for di, d in enumerate(dts) for g in gts}
            for ti, thr in enumerate(iou_thrs):
                used = set()
                for di, d in enumerate(dts):
                    # best gt: search non-ignored first, then ignored
                    best, best_oks = None, thr - 1e-10
                    for pass_ignored in (False, True):
                        if best is not None and pass_ignored:
                            break  # non-ignored match wins outright
                        for g in gts:
                            if gig[id(g)] != pass_ignored:
                                continue
                            if id(g) in used and not g.get("iscrowd", 0):
                                continue
                            o = oks[(di, id(g))]
                            if o > best_oks:
                                best, best_oks = g, o
                    if best is not None:
                        used.add(id(best))
                        if gig[id(best)]:
                            per_thr[ti].append((d["score"], False, True))
                        else:
                            per_thr[ti].append((d["score"], True, False))
                    else:
                        out = dt_area(d) < lo or dt_area(d) > hi
                        per_thr[ti].append((d["score"], False, out))
        if npig == 0:
            stats[aname] = {"ap": -1.0, "ar": -1.0,
                            "ap_t": [-1.0] * len(iou_thrs), "ar_t": [-1.0] * len(iou_thrs)}
            continue
        ap_t, ar_t = [], []
        for ti in range(len(iou_thrs)):
            recs = sorted(per_thr[ti], key=lambda r: -r[0])
            tp = fp = 0
            curve = []  # (recall, precision) after each counted det
            for score, is_tp, ign in recs:
                if ign:
                    continue
                tp += is_tp
                fp += not is_tp
                curve.append((tp / npig, tp / (tp + fp)))
            ar_t.append(curve[-1][0] if curve else 0.0)
            ap = 0.0
            for thr in np.linspace(0, 1, 101):
                cand = [p for (rc, p) in curve if rc >= thr]
                ap += max(cand) if cand else 0.0
            ap_t.append(ap / 101.0)
        stats[aname] = {"ap": float(np.mean(ap_t)), "ar": float(np.mean(ar_t)),
                        "ap_t": ap_t, "ar_t": ar_t}
    return stats


def _random_case(seed):
    """Random tiny dataset mixing normal/crowd/zero-kp gts and area ranges,
    plus PARTIAL per-joint visibility (OKS sums only v>0 joints) and
    occasional >maxDets detection floods (truncation order under ties)."""
    rng = np.random.default_rng(seed)
    images, annotations, results = [], [], []
    ann_id = 1
    for img_id in range(1, rng.integers(2, 5) + 1):
        images.append({"id": img_id, "width": 640, "height": 640})
        for _ in range(rng.integers(0, 4)):
            spread = float(rng.uniform(20, 120))
            x0, y0 = rng.uniform(0, 400, 2)
            kp = _kp(x0, y0, spread)
            crowd = int(rng.random() < 0.25)
            zero_kp = rng.random() < 0.2
            if not zero_kp and rng.random() < 0.35:
                # partial visibility: v=0 joints contribute nothing to OKS
                # (pycocotools masks on vg>0); zero their coords like COCO GT
                invis = rng.random(17) < rng.uniform(0.1, 0.9)
                if invis.all():
                    invis[int(rng.integers(0, 17))] = False
                kp_gt = kp.copy()
                kp_gt[invis] = 0.0
            else:
                kp_gt = kp * (0 if zero_kp else 1)
            annotations.append({
                "id": ann_id, "image_id": img_id, "category_id": 1,
                "keypoints": kp_gt.reshape(-1).tolist(),
                "num_keypoints": int((kp_gt[:, 2] > 0).sum()),
                "area": float(rng.uniform(500, 12000)),
                "bbox": [x0, y0, spread, spread], "iscrowd": crowd,
            })
            ann_id += 1
            for _ in range(rng.integers(0, 3)):
                noisy = kp.copy()
                noisy[:, :2] += rng.normal(0, rng.uniform(0, 25), (17, 2))
                results.append(_result(img_id, noisy, float(rng.uniform(0.05, 1.0))))
        n_fp = int(rng.integers(22, 29)) if rng.random() < 0.1 else int(rng.integers(0, 2))
        for _ in range(n_fp):  # pure false positives; the flood crosses maxDets=20
            results.append(_result(img_id, _kp(*rng.uniform(0, 500, 2)), float(rng.uniform(0.05, 1.0))))
    gt = {"images": images, "annotations": annotations,
          "categories": [{"id": 1, "name": "person"}]}
    return gt, results


def test_random_cases_match_first_principles_evaluator():
    """KeypointEval == the brute-force protocol re-derivation on randomized
    crowd/ignore/area mixtures (the pycocotools-fixture substitute: two
    independent implementations agreeing on every stat)."""
    for seed in range(8):
        gt, results = _random_case(seed)
        if not results:
            continue
        stats = _run(gt, results)
        bf = _bf_eval(gt, results)
        assert abs(stats["AP"] - bf["all"]["ap"]) < 1e-9, (seed, stats["AP"], bf["all"]["ap"])
        assert abs(stats["AR"] - bf["all"]["ar"]) < 1e-9, seed
        assert abs(stats["AP (M)"] - bf["medium"]["ap"]) < 1e-9, seed
        assert abs(stats["AP (L)"] - bf["large"]["ap"]) < 1e-9, seed
        assert abs(stats["AR (M)"] - bf["medium"]["ar"]) < 1e-9, seed
        assert abs(stats["AR (L)"] - bf["large"]["ar"]) < 1e-9, seed
        assert abs(stats["Ap .5"] - bf["all"]["ap_t"][0]) < 1e-9, seed
        assert abs(stats["AP .75"] - bf["all"]["ap_t"][5]) < 1e-9, seed


def test_tied_scores_match_first_principles_evaluator():
    """Score TIES exercise sort stability in the matching and PR accumulation
    (where independent reimplementations of the pycocotools protocol
    classically diverge): quantize scores to 3 levels so most detections tie,
    and require exact agreement on every stat."""
    for seed in range(8, 14):
        gt, results = _random_case(seed)
        if not results:
            continue
        for r in results:  # heavy ties: 3 distinct score values only
            r["score"] = round(r["score"] * 3) / 3.0
        stats = _run(gt, results)
        bf = _bf_eval(gt, results)
        for k, v in (("AP", bf["all"]["ap"]), ("AR", bf["all"]["ar"]),
                     ("AP (M)", bf["medium"]["ap"]), ("AP (L)", bf["large"]["ap"])):
            assert abs(stats[k] - v) < 1e-9, (seed, k, stats[k], v)


def test_oks_exactly_at_threshold_boundary():
    """A detection whose OKS lands exactly on an IoU threshold: both
    implementations must agree on whether it matches (the < vs <= boundary
    the pycocotools protocol pins with its thr-1e-10 epsilon)."""
    kp = _kp(100.0, 100.0, 60.0)
    gt = {
        "images": [{"id": 1, "width": 640, "height": 640}],
        "annotations": [{
            "id": 1, "image_id": 1, "category_id": 1,
            "keypoints": kp.reshape(-1).tolist(), "num_keypoints": 17,
            "area": 3600.0, "bbox": [100.0, 100.0, 60.0, 60.0], "iscrowd": 0,
        }],
        "categories": [{"id": 1, "name": "person"}],
    }
    # sweep shifts whose OKS values straddle the 0.5..0.95 thresholds: both
    # evaluators see the SAME OKS, so every match decision must coincide
    for shift in (2.0, 5.0, 10.0, 15.0, 25.0, 40.0, 80.0):
        noisy = kp.copy()
        noisy[:, 0] += shift
        results = [_result(1, noisy, 0.9)]
        stats = _run(gt, results)
        bf = _bf_eval(gt, results)
        assert abs(stats["AP"] - bf["all"]["ap"]) < 1e-9, shift
        assert abs(stats["Ap .5"] - bf["all"]["ap_t"][0]) < 1e-9, shift
