"""Debug visualization: skeleton and heatmap overlays.

Equivalent of KeyPoints.draw_img / draw_heat_map (commons/transforms.py:
33-61) with the COCO bone/joint color tables from datasets/coco.py:27-42.
Pure numpy + cv2 (host-side debugging only).
"""

from __future__ import annotations

import numpy as np

__all__ = ["BONES", "JOINT_COLORS", "BONE_COLORS", "draw_pose", "draw_heat_map"]

BONES = (
    (0, 1), (0, 2), (1, 3), (2, 4),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10),
    (5, 11), (6, 12), (11, 12), (11, 13), (12, 14), (13, 15), (14, 16),
)

JOINT_COLORS = (
    (187, 183, 180), (149, 32, 71), (92, 113, 184), (131, 7, 201),
    (56, 20, 219), (243, 201, 77), (13, 74, 96), (79, 14, 44),
    (195, 150, 66), (2, 249, 42), (195, 135, 43), (105, 70, 66),
    (120, 107, 116), (122, 241, 22), (17, 19, 179), (162, 185, 124), (31, 65, 117),
)

BONE_COLORS = (
    (67, 68, 113), (130, 45, 169), (2, 202, 130), (127, 111, 90),
    (92, 136, 113), (33, 250, 7), (238, 92, 104), (0, 151, 197), (134, 9, 145),
    (253, 181, 88), (246, 11, 137), (55, 72, 220), (136, 8, 253), (56, 73, 180),
    (85, 241, 53), (153, 207, 15),
)


def draw_pose(img, joints, box=None, bones=BONES, bone_colors=BONE_COLORS, joint_colors=JOINT_COLORS):
    """:param img: HxWx3 uint8 (modified copy returned)
    :param joints: [K, 3] (x, y, vis/conf); joints with column 2 == 0 skipped"""
    import cv2 as cv

    out = np.ascontiguousarray(img.copy())
    for idx, (a, b) in enumerate(bones):
        ja, jb = joints[a], joints[b]
        if ja[2] != 0:
            cv.circle(out, (int(ja[0]), int(ja[1])), 2, joint_colors[a], -1)
        if jb[2] != 0:
            cv.circle(out, (int(jb[0]), int(jb[1])), 2, joint_colors[b], -1)
        if ja[2] != 0 and jb[2] != 0:
            cv.line(out, (int(ja[0]), int(ja[1])), (int(jb[0]), int(jb[1])), bone_colors[idx], 2)
    if box is not None:
        x1, y1, x2, y2 = box
        cv.rectangle(out, (int(x1), int(y1)), (int(x2), int(y2)), (255, 0, 0), 2)
    return out


def draw_heat_map(heat_map, mask=None):
    """[K, H, W] float maps -> HxWx3 uint8 max-composite visualization
    (KeyPoints.draw_heat_map parity, transforms.py:56-61)."""
    import cv2 as cv

    heat_map = np.asarray(heat_map)
    if mask is not None:
        heat_map = heat_map * np.asarray(mask)[:, None, None]
    merged = heat_map.max(axis=0)
    ret = (np.clip(merged, 0, 1) * 255).astype(np.uint8)
    return cv.cvtColor(ret, cv.COLOR_GRAY2BGR)
