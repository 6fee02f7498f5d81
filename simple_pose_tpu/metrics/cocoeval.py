"""COCO keypoint (OKS) evaluation in pure numpy.

The reference delegates to pycocotools.COCOeval (metrics/pose_metrics.py:
182-209), a C extension.  pycocotools is not a dependency here; this module
is a from-scratch implementation of the published COCO keypoint evaluation
protocol with matching semantics:

  * OKS between a detection and a gt uses the gt segmentation area and the
    17 per-joint sigma constants; only gt-visible joints contribute.
  * Greedy matching per OKS threshold (.50:.05:.95), detections sorted by
    score (stable), each matching the best still-available gt; crowd/ignore
    gts can absorb extra detections; unmatched detections whose area falls
    outside the range are ignored.
  * Precision is interpolated (monotone from the right) onto 101 recall
    points; AP averages over thresholds/recall points, AR is max-recall.
  * maxDets = 20, areas: all / medium [32^2, 96^2] / large [96^2, 1e10].

The returned stats dict uses the reference's key spelling
(['AP', 'Ap .5', 'AP .75', 'AP (M)', 'AP (L)', 'AR', ...],
pose_metrics.py:203-204) so downstream code is drop-in compatible.

If pycocotools IS importable, ``evaluate_map`` uses it instead, so results
remain bit-identical with the canonical implementation wherever available.
"""

from __future__ import annotations

import json
from typing import Sequence

import numpy as np

from simple_pose_tpu.ops.oks import COCO_SIGMAS

__all__ = ["CocoKeypointsGT", "KeypointEval", "evaluate_map", "STAT_NAMES"]

STAT_NAMES = ["AP", "Ap .5", "AP .75", "AP (M)", "AP (L)", "AR", "AR .5", "AR .75", "AR (M)", "AR (L)"]

_AREA_RNGS = {
    "all": (0.0, 1e10),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}


class CocoKeypointsGT:
    """Minimal person-keypoints ground-truth index (pycocotools.COCO subset).

    Accepts a person_keypoints_*.json path or an already-parsed dict with
    'images' and 'annotations'.
    """

    PERSON_CAT = 1

    def __init__(self, ann):
        if isinstance(ann, str):
            with open(ann) as rf:
                ann = json.load(rf)
        self.dataset = ann
        self.img_ids = [img["id"] for img in ann.get("images", [])]
        self.imgs = {img["id"]: img for img in ann.get("images", [])}
        self.anns_by_img = {img_id: [] for img_id in self.img_ids}
        for a in ann.get("annotations", []):
            if a.get("category_id", self.PERSON_CAT) != self.PERSON_CAT:
                continue
            if a["image_id"] in self.anns_by_img:
                self.anns_by_img[a["image_id"]].append(a)


def _dt_area_bbox(kps):
    """Detection pseudo-area from keypoint extent (pycocotools loadRes rule)."""
    x = kps[0::3]
    y = kps[1::3]
    x0, x1 = float(np.min(x)), float(np.max(x))
    y0, y1 = float(np.min(y)), float(np.max(y))
    return (x1 - x0) * (y1 - y0)


def _compute_oks(dts, gts, sigmas):
    """[D, G] OKS matrix. dts: list of result dicts, gts: list of ann dicts."""
    ious = np.zeros((len(dts), len(gts)))
    var = (sigmas * 2.0) ** 2
    k = len(sigmas)
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], dtype=np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = int(np.count_nonzero(vg > 0))
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], dtype=np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                # no visible gt joints: distance to the doubled gt box
                z = np.zeros(k)
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx**2 + dy**2) / var / (gt["area"] + np.spacing(1)) / 2.0
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] != 0 else 0.0
    return ious


class KeypointEval:
    """COCO keypoint evaluation over a GT index and a result list.

    results: list of {'image_id', 'category_id', 'keypoints' (len 51),
    'score'} dicts -- exactly what kps_to_dict_ emits (pose_metrics.py:
    172-179).
    """

    def __init__(self, gt: CocoKeypointsGT, results: Sequence[dict], sigmas=None, max_dets: int = 20):
        self.gt = gt
        self.sigmas = np.asarray(sigmas) if sigmas is not None else COCO_SIGMAS
        self.max_dets = max_dets
        self.iou_thrs = np.linspace(0.5, 0.95, 10)
        self.rec_thrs = np.linspace(0.0, 1.0, 101)
        self.dts_by_img = {img_id: [] for img_id in gt.img_ids}
        for r in results:
            if r.get("category_id", 1) != 1:
                continue
            if r["image_id"] not in self.dts_by_img:
                continue
            r = dict(r)
            r["area"] = _dt_area_bbox(np.asarray(r["keypoints"], dtype=np.float64))
            self.dts_by_img[r["image_id"]].append(r)
        self._eval_imgs = None
        self.stats = None
        self.precision = None
        self.recall = None

    # -- per-image matching -------------------------------------------------

    def _evaluate_img(self, img_id, area_rng, ious_full, gts, dts):
        if len(gts) == 0 and len(dts) == 0:
            return None
        T = len(self.iou_thrs)
        g_ignore = np.array(
            [
                1.0
                if (
                    g.get("ignore", 0)
                    or g.get("iscrowd", 0)
                    or g.get("num_keypoints", 0) == 0
                    or g["area"] < area_rng[0]
                    or g["area"] > area_rng[1]
                )
                else 0.0
                for g in gts
            ]
        )
        # stable sort: non-ignored gts first
        gt_order = np.argsort(g_ignore, kind="mergesort")
        gts = [gts[i] for i in gt_order]
        g_ignore = g_ignore[gt_order]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
        ious = ious_full[:, gt_order] if ious_full.size else ious_full

        G, D = len(gts), len(dts)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        dt_ignore = np.zeros((T, D))
        if ious.size:
            for tind, t in enumerate(self.iou_thrs):
                for dind in range(D):
                    iou = min(t, 1.0 - 1e-10)
                    m = -1
                    for gind in range(G):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and g_ignore[m] == 0 and g_ignore[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ignore[tind, dind] = g_ignore[m]
                    dtm[tind, dind] = 1 + m
                    gtm[tind, m] = 1 + dind
        dt_out_of_rng = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1] for d in dts])
        if D:
            dt_ignore = np.logical_or(dt_ignore, np.logical_and(dtm == 0, np.tile(dt_out_of_rng, (T, 1))))
        return {
            "dtMatches": dtm,
            "dtScores": np.array([d["score"] for d in dts]),
            "gtIgnore": g_ignore,
            "dtIgnore": dt_ignore,
        }

    def evaluate(self):
        self._eval_imgs = {name: [] for name in _AREA_RNGS}
        for img_id in self.gt.img_ids:
            gts = self.gt.anns_by_img.get(img_id, [])
            dts = sorted(self.dts_by_img.get(img_id, []), key=lambda d: -d["score"])
            dts = dts[: self.max_dets]
            ious = _compute_oks(dts, gts, self.sigmas) if (gts and dts) else np.zeros((len(dts), len(gts)))
            for name, rng in _AREA_RNGS.items():
                self._eval_imgs[name].append(self._evaluate_img(img_id, rng, ious, gts, dts))
        return self

    # -- accumulation -------------------------------------------------------

    def accumulate(self):
        T = len(self.iou_thrs)
        R = len(self.rec_thrs)
        A = len(_AREA_RNGS)
        self.precision = -np.ones((T, R, A))
        self.recall = -np.ones((T, A))
        for aind, name in enumerate(_AREA_RNGS):
            E = [e for e in self._eval_imgs[name] if e is not None]
            if not E:
                continue
            dt_scores = np.concatenate([e["dtScores"] for e in E])
            inds = np.argsort(-dt_scores, kind="mergesort")
            dtm = np.concatenate([e["dtMatches"] for e in E], axis=1)[:, inds]
            dt_ig = np.concatenate([e["dtIgnore"] for e in E], axis=1)[:, inds]
            gt_ig = np.concatenate([e["gtIgnore"] for e in E])
            npig = int(np.count_nonzero(gt_ig == 0))
            if npig == 0:
                continue
            tps = np.logical_and(dtm, np.logical_not(dt_ig))
            fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
            for t in range(T):
                tp = tp_sum[t]
                fp = fp_sum[t]
                nd = len(tp)
                rc = tp / npig
                pr = tp / (fp + tp + np.spacing(1))
                self.recall[t, aind] = rc[-1] if nd else 0
                pr = pr.tolist()
                # make precision monotone decreasing from the right
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                q = np.zeros(R)
                rec_inds = np.searchsorted(rc, self.rec_thrs, side="left")
                for ri, pi in enumerate(rec_inds):
                    if pi < nd:
                        q[ri] = pr[pi]
                self.precision[t, :, aind] = q
        return self

    def _summary(self, ap=True, iou_thr=None, area="all"):
        aind = list(_AREA_RNGS).index(area)
        if ap:
            s = self.precision[:, :, aind]
            if iou_thr is not None:
                s = s[np.isclose(self.iou_thrs, iou_thr)]
        else:
            s = self.recall[:, aind]
            if iou_thr is not None:
                s = s[np.isclose(self.iou_thrs, iou_thr)]
        valid = s[s > -1]
        return float(np.mean(valid)) if valid.size else -1.0

    def summarize(self):
        self.stats = {
            "AP": self._summary(True),
            "Ap .5": self._summary(True, 0.5),
            "AP .75": self._summary(True, 0.75),
            "AP (M)": self._summary(True, area="medium"),
            "AP (L)": self._summary(True, area="large"),
            "AR": self._summary(False),
            "AR .5": self._summary(False, 0.5),
            "AR .75": self._summary(False, 0.75),
            "AR (M)": self._summary(False, area="medium"),
            "AR (L)": self._summary(False, area="large"),
        }
        return self.stats


def evaluate_map(res, ann, ann_type="keypoints", silence=True):
    """Drop-in replacement for the reference evaluate_map
    (metrics/pose_metrics.py:182-209): res/ann may be file paths or parsed
    objects; returns the 10-stat dict keyed by STAT_NAMES.

    Uses pycocotools when importable (canonical numbers), else the numpy
    implementation above.
    """
    try:
        import contextlib
        import io

        from pycocotools.coco import COCO  # type: ignore
        from pycocotools.cocoeval import COCOeval  # type: ignore

        assert isinstance(ann, str) and isinstance(res, str), "pycocotools path needs file paths"
        with contextlib.redirect_stdout(io.StringIO()) if silence else contextlib.nullcontext():
            coco_gt = COCO(ann)
            coco_dt = coco_gt.loadRes(res)
            coco_eval = COCOeval(coco_gt, coco_dt, ann_type)
            coco_eval.evaluate()
            coco_eval.accumulate()
            coco_eval.summarize()
        return {name: coco_eval.stats[i] for i, name in enumerate(STAT_NAMES)}
    except ImportError:
        pass

    if isinstance(res, str):
        with open(res) as rf:
            res = json.load(rf)
    gt = CocoKeypointsGT(ann)
    ev = KeypointEval(gt, res)
    ev.evaluate()
    ev.accumulate()
    return ev.summarize()
