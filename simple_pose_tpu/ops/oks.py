"""OKS (Object Keypoint Similarity) IoU and greedy OKS-NMS.

Behavioral parity with datasets/naive_data.py:120-173 (the vectorized
OKS + greedy suppression used by the detector-box rescoring workflow,
eval.py:182).  Runs on host numpy: candidate counts per image are tiny
(<=20 after maxDets) and the greedy loop is inherently sequential.

Formulation: for a kept pose g and candidates D, per-joint squared error
is scaled by the COCO falloff variances and by the *pairwise mean area*
(area_g + area_d)/2 -- the reference's convention, which differs from
pycocotools' gt-area-only scaling -- then OKS = mean(exp(-e)) over the
contributing joints.  With a visibility threshold, only joints confident
in BOTH poses contribute (and the mean is over those joints).
"""

from __future__ import annotations

import numpy as np

__all__ = ["COCO_SIGMAS", "oks_iou", "oks_nms"]

# COCO keypoint per-joint falloff constants (pycocotools convention / 10)
COCO_SIGMAS = (
    np.array([0.26, 0.25, 0.25, 0.35, 0.35, 0.79, 0.79, 0.72, 0.72, 0.62, 0.62, 1.07, 1.07, 0.87, 0.87, 0.89, 0.89])
    / 10.0
)


def oks_iou(ref_pose, others, ref_area, other_areas, sigmas=None, in_vis_thresh=None):
    """OKS of one reference pose against a stack of others.

    :param ref_pose: [K, 3] (x, y, conf)
    :param others: [N, K, 3]
    :param ref_area: scalar area of the reference pose's box
    :param other_areas: [N]
    :param in_vis_thresh: if set, a joint contributes only when its
        confidence exceeds the threshold in BOTH poses.
    :returns: [N] OKS values (behavior of datasets/naive_data.py:120-150).
    """
    if sigmas is None:
        sigmas = COCO_SIGMAS
    others = np.asarray(others, dtype=np.float64)
    falloff_var = 2.0 * np.square(2.0 * np.asarray(sigmas))  # [K]
    scale = (np.asarray(other_areas, dtype=np.float64) + ref_area) / 2.0 + 1e-12  # [N]
    sq_dist = np.sum(np.square(others[..., :2] - ref_pose[None, :, :2]), axis=-1)  # [N, K]
    err = sq_dist / (falloff_var[None, :] * scale[:, None])
    if in_vis_thresh is None:
        contributes = np.ones(others.shape[:2], dtype=np.float64)
    else:
        contributes = (
            (others[..., 2] > in_vis_thresh) & (ref_pose[None, :, 2] > in_vis_thresh)
        ).astype(np.float64)
    return np.sum(np.exp(-err) * contributes, axis=-1) / (np.sum(contributes, axis=-1) + 1e-12)


def oks_nms(kps, scores, areas, thresh, sigmas=None, in_vis_thresh=None):
    """Greedy OKS-NMS; returns indices of kept poses (score-descending).

    Behavior of datasets/naive_data.py:153-173: repeatedly keep the highest-
    scoring remaining pose and drop every candidate whose OKS against it
    exceeds ``thresh``."""
    remaining = np.asarray(scores).argsort()[::-1]
    keep = []
    while remaining.size > 0:
        top, remaining = remaining[0], remaining[1:]
        keep.append(int(top))
        if remaining.size == 0:
            break
        sim = oks_iou(kps[top], kps[remaining], areas[top], areas[remaining], sigmas, in_vis_thresh)
        remaining = remaining[sim <= thresh]
    return keep
