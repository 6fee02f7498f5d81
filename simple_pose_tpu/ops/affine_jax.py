"""Batched on-device affine construction (jnp) for the fused
detect -> crop -> pose program.

boxes_to_crop_affines is the jit-compatible composition of
box_to_center_scale + get_affine_transform(rot=0) (ops/affine.py): for
axis-aligned transforms the 3-point construction collapses to a closed-form
scale + translation, validated against the numpy path in tests.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["boxes_to_crop_affines", "affine_crop_separable_multi"]


def boxes_to_crop_affines(boxes, input_shape=(192, 256), output_shape=(48, 64), scale_mult=1.25):
    """[..., 4] xyxy boxes -> (trans [..., 2, 3] into the input crop,
    trans_inv [..., 2, 3] from the output heatmap back to source coords).

    input_shape/output_shape are (w, h) like the reference."""
    in_w, in_h = float(input_shape[0]), float(input_shape[1])
    out_w, out_h = float(output_shape[0]), float(output_shape[1])
    aspect = in_w / in_h
    x1, y1, x2, y2 = boxes[..., 0], boxes[..., 1], boxes[..., 2], boxes[..., 3]
    w = x2 - x1
    h = y2 - y1
    cx = x1 + w * 0.5
    cy = y1 + h * 0.5
    w_snap = jnp.where(w < aspect * h, h * aspect, w)
    h_snap = jnp.where(w > aspect * h, w / aspect, h)
    sw = w_snap * scale_mult
    sh = h_snap * scale_mult

    def build(k_w, k_h, dst_w, dst_h):
        zeros = jnp.zeros_like(cx)
        row0 = jnp.stack([k_w, zeros, dst_w * 0.5 - k_w * cx], axis=-1)
        row1 = jnp.stack([zeros, k_h, dst_h * 0.5 - k_h * cy], axis=-1)
        return jnp.stack([row0, row1], axis=-2)

    # src -> crop: uniform scale k = dst_w / sw (aspect snapped, so the y
    # scale dst_h / sh is identical)
    trans = build(in_w / sw, in_w / sw, in_w, in_h)
    # heatmap -> src
    k_inv = sw / out_w
    zeros = jnp.zeros_like(cx)
    row0 = jnp.stack([k_inv, zeros, cx - k_inv * out_w * 0.5], axis=-1)
    row1 = jnp.stack([zeros, k_inv, cy - k_inv * out_h * 0.5], axis=-1)
    trans_inv = jnp.stack([row0, row1], axis=-2)
    return trans, trans_inv


def affine_crop_separable_multi(images, trans, out_hw, out_dtype=None):
    """P crops per image without replicating the images.

    :param images: [B, H, W, C]
    :param trans: [B, P, 2, 3] axis-aligned src->dst affines
    :param out_dtype: optional narrowed output (f32 resample either way)
    :returns: [B, P, out_h, out_w, C] float32 (or out_dtype)"""
    from simple_pose_tpu.ops.warp import invert_affine_batch, _interp_matrix

    b, h, w, c = images.shape
    p = trans.shape[1]
    oh, ow = out_hw
    inv = invert_affine_batch(jnp.asarray(trans, jnp.float32).reshape(b * p, 2, 3))
    sx, tx = inv[:, 0, 0], inv[:, 0, 2]
    sy, ty = inv[:, 1, 1], inv[:, 1, 2]
    ry = _interp_matrix(ty, sy, oh, h).reshape(b, p, oh, h)
    cx = _interp_matrix(tx, sx, ow, w).reshape(b, p, ow, w)
    img = images.astype(jnp.float32)
    tmp = jnp.einsum("bpoh,bhwc->bpowc", ry, img, preferred_element_type=jnp.float32)
    out = jnp.einsum("bpxw,bpowc->bpoxc", cx, tmp, preferred_element_type=jnp.float32)
    return out if out_dtype is None else out.astype(out_dtype)
