"""Jittable fixed-size NMS (replaces torchvision.ops.nms +
detector/yolov5_detector.py:52-126).

All shapes are static: candidates are the top-`pre_nms` (box, class) pairs by
confidence; the greedy suppression runs as a fori_loop over a precomputed IoU
matrix; outputs are [max_det, 6] (x1, y1, x2, y2, conf, cls) plus a validity
mask.  Matches the reference semantics: obj-conf candidate filter, conf =
obj * cls, multi-label expansion, class-offset batched NMS, optional
merge-NMS weighted box fusion (with the redundancy requirement).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["xywh2xyxy", "box_iou", "non_max_suppression_jit"]

_MAX_WH = 4096.0


def xywh2xyxy(x):
    xy = x[..., :2]
    wh = x[..., 2:4]
    return jnp.concatenate([xy - wh / 2.0, xy + wh / 2.0], axis=-1)


def box_iou(a, b):
    """[N,4] x [M,4] -> [N,M] IoU (xyxy)."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0.0), axis=-1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def _nms_single(pred, conf_thresh, iou_thresh, max_det, pre_nms, multi_label, agnostic, merge):
    """pred: [N, 5+nc] decoded (xywh, obj, cls...)."""
    nc = pred.shape[-1] - 5
    obj = pred[:, 4]
    cls_conf = pred[:, 5:] * obj[:, None]  # [N, nc]
    cand = obj > conf_thresh
    if multi_label:
        scores_flat = jnp.where(cand[:, None] & (cls_conf > conf_thresh), cls_conf, 0.0).reshape(-1)
    else:
        best = jnp.max(cls_conf, axis=-1)
        best_cls = jnp.argmax(cls_conf, axis=-1)
        onehot = jax.nn.one_hot(best_cls, nc, dtype=jnp.float32)
        scores_flat = (jnp.where(cand & (best > conf_thresh), best, 0.0)[:, None] * onehot).reshape(-1)

    k = min(pre_nms, scores_flat.shape[0])
    top_scores, top_idx = jax.lax.top_k(scores_flat, k)
    box_idx = top_idx // nc
    cls_idx = (top_idx % nc).astype(jnp.float32)
    boxes = xywh2xyxy(pred[box_idx, :4])
    valid = top_scores > 0.0

    off = jnp.zeros_like(cls_idx) if agnostic else cls_idx * _MAX_WH
    oboxes = boxes + off[:, None]
    iou = box_iou(oboxes, oboxes)

    idxs = jnp.arange(k)

    def body(i, alive):
        sup = (iou[i] > iou_thresh) & (idxs > i)
        return jnp.where(alive[i], alive & ~sup, alive)

    alive = jax.lax.fori_loop(0, k, body, valid)
    keep = alive & valid

    out_boxes = boxes
    if merge:
        # weighted box fusion over overlapping candidates (yolov5_detector.py:113-122)
        w = (iou > iou_thresh).astype(jnp.float32) * top_scores[None, :] * valid[None, :]
        merged = (w @ boxes) / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
        redundant = jnp.sum(iou > iou_thresh, axis=1) > 1
        out_boxes = jnp.where(keep[:, None], merged, boxes)
        keep = keep & redundant

    final_scores = jnp.where(keep, top_scores, 0.0)
    md = min(max_det, k)
    sel_scores, sel = jax.lax.top_k(final_scores, md)
    dets = jnp.concatenate(
        [out_boxes[sel], sel_scores[:, None], cls_idx[sel][:, None]], axis=-1
    )
    if md < max_det:  # pad to the static max_det shape
        dets = jnp.concatenate([dets, jnp.zeros((max_det - md, 6), dets.dtype)], axis=0)
        sel_scores = jnp.concatenate([sel_scores, jnp.zeros((max_det - md,), sel_scores.dtype)])
    return dets, sel_scores > 0.0


@partial(
    jax.jit,
    static_argnames=("conf_thresh", "iou_thresh", "max_det", "pre_nms", "multi_label", "agnostic", "merge"),
)
def non_max_suppression_jit(prediction, conf_thresh=0.1, iou_thresh=0.6, max_det=300,
                            pre_nms=512, multi_label=True, agnostic=False, merge=False):
    """:param prediction: [B, N, 5+nc] decoded head output
    :returns: (dets [B, max_det, 6], valid [B, max_det] bool)"""
    f = partial(_nms_single, conf_thresh=conf_thresh, iou_thresh=iou_thresh, max_det=max_det,
                pre_nms=pre_nms, multi_label=multi_label, agnostic=agnostic, merge=merge)
    return jax.vmap(f)(prediction)
