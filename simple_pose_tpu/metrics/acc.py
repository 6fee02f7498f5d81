"""Training-time PCK-style heatmap accuracy (jittable).

Parity with HeatMapAcc (metrics/pose_metrics.py:212-245): argmax both maps,
distance normalized by (w, h)/norm_frac, a joint counts as correct when the
normalized distance is below distance_thresh; labels at x<=1 or y<=1 are
invalid; per-joint accuracy averaged over joints that have >=1 valid label.
"""

from __future__ import annotations

import jax.numpy as jnp

from simple_pose_tpu.ops.decode import heatmap_to_coords

__all__ = ["heatmap_accuracy"]


def heatmap_accuracy(predicts, targets, distance_thresh=0.5, norm_frac=10.0):
    """:param predicts: [B, C, H, W]; :param targets: [B, C, H, W]
    :returns: scalar accuracy in [0, 1]."""
    preds, _ = heatmap_to_coords(predicts)
    labels, _ = heatmap_to_coords(targets)
    h, w = predicts.shape[-2:]
    norm = jnp.asarray([w, h], dtype=jnp.float32) / norm_frac
    valid = (labels[..., 0] > 1) & (labels[..., 1] > 1)  # [B, C]
    distance = jnp.linalg.norm(preds / norm - labels / norm, axis=-1)  # [B, C]
    correct = (distance < distance_thresh) & valid
    per_joint_valid = jnp.sum(valid, axis=0)  # [C]
    per_joint_acc = jnp.sum(correct, axis=0) / jnp.maximum(per_joint_valid, 1)
    has_valid = per_joint_valid >= 1
    cnt = jnp.sum(has_valid)
    acc = jnp.sum(jnp.where(has_valid, per_joint_acc, 0.0)) / jnp.maximum(cnt, 1)
    return jnp.where(cnt > 0, acc, 0.0)
