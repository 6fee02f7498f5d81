"""OKS (Object Keypoint Similarity) IoU and greedy OKS-NMS.

Behavioral parity with datasets/naive_data.py:120-173 (vectorized oks_iou /
oks_nms used by the detector-box rescoring workflow, eval.py:182).  Runs on
host numpy: candidate counts per image are tiny (<=20 after maxDets) and the
greedy loop is inherently sequential.
"""

from __future__ import annotations

import numpy as np

__all__ = ["COCO_SIGMAS", "oks_iou", "oks_nms"]

# COCO keypoint per-joint falloff constants (pycocotools convention / 10)
COCO_SIGMAS = (
    np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


def oks_iou(pick_kps, candi_kps, pick_area, candi_area, sigmas=None, in_vis_thresh=None):
    """OKS between one pose and a set of candidate poses.

    :param pick_kps: [K, 3] (x, y, conf)
    :param candi_kps: [N, K, 3]
    :param pick_area: scalar area of the picked pose
    :param candi_area: [N] candidate areas
    :param in_vis_thresh: if set, only joints where both confidences exceed
        the threshold contribute.
    :returns: [N] OKS values.  Mirrors datasets/naive_data.py:120-150.
    """
    if sigmas is None:
        sigmas = COCO_SIGMAS
    var = (np.asarray(sigmas) * 2.0) ** 2
    xg, yg, vg = pick_kps[:, 0], pick_kps[:, 1], pick_kps[:, 2]
    xds, yds, vds = candi_kps[..., 0], candi_kps[..., 1], candi_kps[..., 2]
    dx = xds - xg
    dy = yds - yg
    e = (dx**2 + dy**2) / var / ((pick_area + candi_area)[:, None] / 2.0 + 1e-12) / 2.0
    vd_vis = np.ones_like(vds, dtype=np.float32)
    if in_vis_thresh is not None:
        vg_vis = np.tile((vg > in_vis_thresh)[None, :], (vds.shape[0], 1))
        vd_vis = ((vds > in_vis_thresh) & vg_vis).astype(np.float32)
    return (np.exp(-e) * vd_vis).sum(-1) / (vd_vis.sum(-1) + 1e-12)


def oks_nms(kps, scores, areas, thresh, sigmas=None, in_vis_thresh=None):
    """Greedy OKS-NMS; returns indices of kept poses (score-descending).

    Mirrors datasets/naive_data.py:153-173."""
    order = np.asarray(scores).argsort()[::-1]
    keep = []
    while order.size > 0:
        pick = order[0]
        keep.append(int(pick))
        order = order[1:]
        if order.size == 0:
            break
        ovr = oks_iou(kps[pick], kps[order], areas[pick], areas[order], sigmas, in_vis_thresh)
        order = order[ovr <= thresh]
    return keep
