"""Affine geometry core (host side, numpy).

Behavioral parity targets (reference: liangheming/simple_pose):
  * box_to_center_scale / center_scale_to_box  -> commons/joint_utils.py:39-68
  * get_affine_transform (3-point construction) -> commons/joint_utils.py:115-152
    The cv2.getAffineTransform call is replaced by a closed-form 3x3 solve.
  * affine_transform_joints                     -> commons/joint_utils.py:88-99
  * flip_joints                                 -> commons/joint_utils.py:102-112
  * box_jitter (DPG random crop augmentation)   -> commons/joint_utils.py:6-36

These run on the host per sample (they are a handful of scalar FLOPs); the
heavy work they parameterize -- bilinear crop sampling and Gaussian target
encoding -- runs on-device (see ops/warp.py and ops/heatmap.py).

Matrices follow the cv2 convention used throughout the reference:
a 2x3 matrix ``M`` maps homogeneous points row-wise, ``dst = M @ [x, y, 1]``.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "box_to_center_scale",
    "center_scale_to_box",
    "get_affine_transform",
    "solve_affine",
    "affine_transform_joints",
    "flip_joints",
    "box_jitter",
    "invert_affine",
    "compose_affine",
    "hflip_affine",
]


def box_to_center_scale(x, y, w, h, aspect_ratio=1.0, scale_mult=1.25):
    """Convert an xywh box to (center, scale) with aspect-ratio snapping.

    The box is grown along one axis so that w/h == aspect_ratio, then padded
    by ``scale_mult``.  Mirrors commons/joint_utils.py:39-56 (pixel_std == 1).
    """
    center = np.array([x + w * 0.5, y + h * 0.5], dtype=np.float32)
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w, h], dtype=np.float32)
    if center[0] != -1:
        scale = scale * scale_mult
    return center, scale


def center_scale_to_box(center, scale):
    """Inverse of box_to_center_scale (sans the snap): xyxy box around center.

    Mirrors commons/joint_utils.py:59-68."""
    w, h = float(scale[0]), float(scale[1])
    xmin = float(center[0]) - w * 0.5
    ymin = float(center[1]) - h * 0.5
    return (xmin, ymin, xmin + w, ymin + h)


def _third_point(a, b):
    """Third vertex of the right isoceles triangle on segment (a, b):
    b + rot90(a - b).  Mirrors commons/joint_utils.py:71-74."""
    d = a - b
    return b + np.array([-d[1], d[0]], dtype=np.float64)


def solve_affine(src, dst):
    """Exact 2x3 affine mapping three src points onto three dst points.

    Closed-form replacement for cv2.getAffineTransform: solves the 3x3
    linear system [src | 1] @ M.T = dst in float64.
    """
    src = np.asarray(src, dtype=np.float64).reshape(3, 2)
    dst = np.asarray(dst, dtype=np.float64).reshape(3, 2)
    a = np.concatenate([src, np.ones((3, 1), dtype=np.float64)], axis=1)
    m = np.linalg.solve(a, dst)  # (3, 2)
    return np.ascontiguousarray(m.T)  # (2, 3)


def get_affine_transform(center, scale, rot, output_size, shift=(0.0, 0.0)):
    """Build the crop affine and its inverse from (center, scale, rot).

    Same 3-point construction as commons/joint_utils.py:115-152: the source
    triangle spans the (rotated) person box, the destination triangle spans
    the output patch.  Returns (trans, trans_inv), each 2x3 float64, where
    ``trans`` maps source-image coords -> output-patch coords.
    """
    scale = np.asarray(scale, dtype=np.float64).reshape(2)
    shift = np.asarray(shift, dtype=np.float64).reshape(2)
    center = np.asarray(center, dtype=np.float64).reshape(2)
    src_w = scale[0]
    dst_w, dst_h = float(output_size[0]), float(output_size[1])

    rot_rad = np.pi * float(rot) / 180.0
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    # rotate (0, -src_w/2) by rot_rad
    src_dir = np.array([src_w * 0.5 * sn, -src_w * 0.5 * cs], dtype=np.float64)
    dst_dir = np.array([0.0, -dst_w * 0.5], dtype=np.float64)

    src = np.zeros((3, 2), dtype=np.float64)
    dst = np.zeros((3, 2), dtype=np.float64)
    src[0] = center + scale * shift
    src[1] = center + src_dir + scale * shift
    src[2] = _third_point(src[0], src[1])
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = _third_point(dst[0], dst[1])

    trans = solve_affine(src, dst)
    trans_inv = solve_affine(dst, src)
    return trans, trans_inv


def invert_affine(m):
    """Invert a 2x3 affine matrix."""
    m = np.asarray(m, dtype=np.float64)
    a = m[:, :2]
    b = m[:, 2]
    a_inv = np.linalg.inv(a)
    out = np.zeros((2, 3), dtype=np.float64)
    out[:, :2] = a_inv
    out[:, 2] = -a_inv @ b
    return out


def compose_affine(m2, m1):
    """Compose 2x3 affines: result applies m1 first, then m2."""
    m1 = np.asarray(m1, dtype=np.float64)
    m2 = np.asarray(m2, dtype=np.float64)
    out = np.zeros((2, 3), dtype=np.float64)
    out[:, :2] = m2[:, :2] @ m1[:, :2]
    out[:, 2] = m2[:, :2] @ m1[:, 2] + m2[:, 2]
    return out


def hflip_affine(width):
    """2x3 affine for horizontal flip of an image of the given width:
    x -> width - 1 - x.  Used to fold the reference's np.fliplr
    (commons/joint_utils.py:104) into the crop matrix so the image is never
    flipped on the host."""
    return np.array([[-1.0, 0.0, float(width) - 1.0], [0.0, 1.0, 0.0]], dtype=np.float64)


def affine_transform_joints(joints, m):
    """Apply a 2x3 affine to [K, 3] (x, y, vis) joints; only vis>0 move.

    Mirrors commons/joint_utils.py:88-99."""
    joints = np.array(joints, copy=True)
    valid = joints[:, 2] > 0
    pts = joints[valid, :2]
    ones = np.ones_like(pts[:, :1])
    joints[valid, :2] = np.concatenate([pts, ones], axis=-1) @ np.asarray(m).T
    return joints


def flip_joints(joints, width, joint_pairs):
    """Horizontally flip [K, 3] joints and swap left/right pairs.

    Mirrors the joint half of commons/joint_utils.py:102-112 (the image half
    is folded into the sampling matrix by hflip_affine)."""
    joints = np.array(joints, copy=True)
    joints[:, 0] = width - joints[:, 0] - 1
    for a, b in joint_pairs:
        joints[[a, b]] = joints[[b, a]]
    return joints


def box_jitter(bbox, img_width, img_ht, rng):
    """DPG box augmentation: random sub-patch crop or Gaussian corner jitter.

    Mirrors commons/joint_utils.py:6-36 (the ``box_crop`` augmentation).
    ``rng`` is a numpy Generator; returns a new xyxy list.
    """
    x1, y1, x2, y2 = float(bbox[0]), float(bbox[1]), float(bbox[2]), float(bbox[3])
    width = x2 - x1
    ht = y2 - y1
    path_scale = rng.uniform(0, 1)
    if path_scale > 0.85:
        ratio = ht / width
        if width < ht:
            patch_width = path_scale * width
            patch_ht = patch_width * ratio
        else:
            patch_ht = path_scale * ht
            patch_width = patch_ht / ratio
        xmin = x1 + rng.uniform(0, 1) * (width - patch_width)
        ymin = y1 + rng.uniform(0, 1) * (ht - patch_ht)
        xmax = xmin + patch_width + 1
        ymax = ymin + patch_ht + 1
    else:
        xmin = max(1, min(x1 + rng.normal(-0.0142, 0.1158) * width, img_width - 3))
        ymin = max(1, min(y1 + rng.normal(0.0043, 0.068) * ht, img_ht - 3))
        xmax = min(max(xmin + 2, x2 + rng.normal(0.0154, 0.1337) * width), img_width - 3)
        ymax = min(max(ymin + 2, y2 + rng.normal(-0.0013, 0.0711) * ht), img_ht - 3)
    return [xmin, ymin, xmax, ymax]
