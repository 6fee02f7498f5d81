"""Batched on-device affine crop (the cv2.warpAffine replacement).

The reference warps every person crop on CPU dataloader workers
(commons/transforms.py:139,214; datasets/naive_data.py:50) -- the classic
input-bound bottleneck.  Here the full (zero-padded) source images live on
device and crops are sampled inside the jitted step.

Two implementations, same semantics (cv2.warpAffine INTER_LINEAR with
BORDER_CONSTANT 0, exact float bilinear instead of cv2's 5-bit fixed point):

  * ``affine_crop``            -- general path: 4-neighbor gather, any affine
                                  (training augmentation includes +-40 deg
                                  rotation).
  * ``affine_crop_separable``  -- MXU path for axis-aligned transforms
                                  (rot == 0, i.e. every eval config): an
                                  axis-aligned bilinear warp factorizes
                                  exactly into two interpolation matmuls
                                  out = R_y @ img @ C_x^T, which XLA tiles
                                  onto the systolic array -- no gathers.

Matrices follow the cv2.warpAffine convention: ``trans`` maps SOURCE coords
to DESTINATION coords and is inverted on device (cv2 inverts internally when
WARP_INVERSE_MAP is not set).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = [
    "invert_affine_batch",
    "affine_crop",
    "affine_crop_separable",
    "affine_crop_mxu",
]


def invert_affine_batch(m):
    """Invert [..., 2, 3] affines."""
    a, b, c, d = m[..., 0, 0], m[..., 0, 1], m[..., 1, 0], m[..., 1, 1]
    tx, ty = m[..., 0, 2], m[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    row0 = jnp.stack([ia, ib, itx], axis=-1)
    row1 = jnp.stack([ic, id_, ity], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _src_coords(inv, out_hw, dtype=jnp.float32):
    """Map the output pixel grid through [B, 2, 3] dst->src affines.

    Returns (src_x, src_y), each [B, oh, ow]."""
    oh, ow = out_hw
    xs = jnp.arange(ow, dtype=dtype)[None, None, :]
    ys = jnp.arange(oh, dtype=dtype)[None, :, None]
    inv = inv.astype(dtype)
    src_x = inv[:, 0, 0, None, None] * xs + inv[:, 0, 1, None, None] * ys + inv[:, 0, 2, None, None]
    src_y = inv[:, 1, 0, None, None] * xs + inv[:, 1, 1, None, None] * ys + inv[:, 1, 2, None, None]
    return src_x, src_y


def affine_crop(images, trans, out_hw):
    """General batched bilinear affine crop.

    :param images: [B, H, W, C] (any real dtype; uint8 fine)
    :param trans: [B, 2, 3] source->dest affines (cv2 convention)
    :param out_hw: (out_h, out_w)
    :returns: [B, out_h, out_w, C] float32
    """
    b, h, w, c = images.shape
    oh, ow = out_hw
    inv = invert_affine_batch(jnp.asarray(trans, dtype=jnp.float32))
    src_x, src_y = _src_coords(inv, out_hw)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    wx = src_x - x0
    wy = src_y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    img = images.astype(jnp.float32).reshape(b, h * w, c)

    def tap(xi, yi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
        vals = jnp.take_along_axis(img, idx.reshape(b, oh * ow, 1), axis=1)
        vals = vals.reshape(b, oh, ow, c)
        return vals * valid[..., None].astype(jnp.float32)

    v00 = tap(x0, y0)
    v01 = tap(x0 + 1, y0)
    v10 = tap(x0, y0 + 1)
    v11 = tap(x0 + 1, y0 + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _interp_matrix(starts, steps, out_size, src_size):
    """[B, out_size, src_size] bilinear interpolation matrices.

    Row ``o`` holds weight (1-frac) at floor(p) and frac at floor(p)+1 where
    p = starts + o*steps; out-of-range taps get zero weight (BORDER_CONSTANT).
    """
    o = jnp.arange(out_size, dtype=jnp.float32)[None, :]  # [1, O]
    p = starts[:, None] + o * steps[:, None]  # [B, O]
    p0 = jnp.floor(p)
    frac = p - p0
    s = jnp.arange(src_size, dtype=jnp.float32)[None, None, :]  # [1, 1, S]
    p0 = p0[..., None]  # [B, O, 1]
    frac = frac[..., None]
    m = jnp.where(s == p0, 1.0 - frac, 0.0) + jnp.where(s == p0 + 1.0, frac, 0.0)
    return m  # [B, O, S]


def affine_crop_separable(images, trans, out_hw, out_dtype=None):
    """Axis-aligned batched bilinear crop as two MXU matmuls.

    Requires trans[:, 0, 1] == trans[:, 1, 0] == 0 (no rotation/shear), which
    holds for every eval transform (rot=0: datasets/naive_data.py:48-49 and
    the augment=False path of datasets/coco.py:51-56).  Exact same math as
    ``affine_crop`` in that regime.

    out_dtype: optional output cast (e.g. bfloat16 when the consumer is a
    bf16 network).  The resample itself stays f32; XLA fuses the cast into
    the final matmul's epilogue, so this halves the crop's HBM write and
    removes the downstream convert_element_type pass (<=1 ulp of bf16).

    :returns: [B, out_h, out_w, C] float32 (or out_dtype)
    """
    b, h, w, c = images.shape
    oh, ow = out_hw
    inv = invert_affine_batch(jnp.asarray(trans, dtype=jnp.float32))
    # src_x = sx*x + tx ; src_y = sy*y + ty
    sx, tx = inv[:, 0, 0], inv[:, 0, 2]
    sy, ty = inv[:, 1, 1], inv[:, 1, 2]
    ry = _interp_matrix(ty, sy, oh, h)  # [B, oh, H]
    cx = _interp_matrix(tx, sx, ow, w)  # [B, ow, W]
    img = images.astype(jnp.float32)
    # [B, oh, H] @ [B, H, W*C] -> [B, oh, W, C] ; then contract W with cx
    tmp = jnp.einsum("boh,bhwc->bowc", ry, img, preferred_element_type=jnp.float32)
    out = jnp.einsum("bxw,bowc->boxc", cx, tmp, preferred_element_type=jnp.float32)
    return out if out_dtype is None else out.astype(out_dtype)


# ---------------------------------------------------------------------------
# MXU path for general (rotated) affines.
#
# XLA's gather is near-serial on TPU (~70M taps/s: a 128x256x192 crop batch
# costs ~350ms -- measured), so the general warp is reformulated as matrix
# multiplies:
#
#   inv = [A | t],  A = D @ R   with D = diag(row norms), R unit-row.
#   Stage 1: intermediate I(u) = canvas(D u + t - D u0) -- axis-aligned,
#            the two separable interpolation matmuls of affine_crop_separable
#            (exact bilinear).
#   Stage 2: out(x) = I(R x + u0) -- a bounded "rotation" resample done with
#            one-hot bilinear interpolation matrices built on the fly from
#            iota comparisons and contracted on the MXU (two chained
#            matmuls per output-row block, scanned to bound memory).
#
# By Cauchy-Schwarz the rotated output rect spans < 321 px in each u axis for
# ANY input affine, so the intermediate size is static.  u0 is rounded to an
# integer, so when A is axis-aligned R == identity and stage 2 reduces to an
# exact integer passthrough: the eval path (rot=0) remains single-resample
# cv2 parity.  With rotation, the result composes two bilinear resamples --
# within the interpolation tolerance of cv2's own 5-bit fixed-point weights
# (training augmentation only; see tests/test_warp.py).
# ---------------------------------------------------------------------------


def _onehot_lerp(pos, size, dtype):
    """[..., size] matrix: rows are 2-tap bilinear one-hots at positions pos.

    Out-of-range taps get zero weight (BORDER_CONSTANT semantics)."""
    p0 = jnp.floor(pos)
    frac = (pos - p0)[..., None]
    s = jnp.arange(size, dtype=jnp.float32)
    p0 = p0[..., None]
    m = jnp.where(s == p0, 1.0 - frac, 0.0) + jnp.where(s == p0 + 1.0, frac, 0.0)
    return m.astype(dtype)


def decompose_affine(trans, out_hw, inter):
    """inv = [A|t], A = D R split used by the two-stage MXU/Pallas warps.

    :returns: (d0, d1, r_mat [B,2,2], u0 [B,2] integer-valued, t1x, t1y)"""
    ow = out_hw[1]
    oh = out_hw[0]
    inv = invert_affine_batch(jnp.asarray(trans, dtype=jnp.float32))
    a_mat = inv[:, :, :2]
    t_vec = inv[:, :, 2]
    d0 = jnp.linalg.norm(a_mat[:, 0, :], axis=-1) + 1e-12
    d1 = jnp.linalg.norm(a_mat[:, 1, :], axis=-1) + 1e-12
    r_mat = a_mat / jnp.stack([d0, d1], axis=-1)[..., None]
    corners = jnp.asarray(
        [[0.0, 0.0], [ow - 1.0, 0.0], [0.0, oh - 1.0], [ow - 1.0, oh - 1.0]], dtype=jnp.float32
    )
    u_corners = jnp.einsum("bij,kj->bki", r_mat, corners)
    u0 = jnp.ceil(-jnp.min(u_corners, axis=1)) + 1.0
    t1x = t_vec[:, 0] - d0 * u0[:, 0]
    t1y = t_vec[:, 1] - d1 * u0[:, 1]
    return d0, d1, r_mat, u0, t1x, t1y


def stage1_resample(images, d0, d1, t1x, t1y, inter, compute_dtype=jnp.bfloat16):
    """Separable axis-aligned resample canvas -> [B, inter, inter, C] f32."""
    b, h, w, c = images.shape
    ry = _interp_matrix(t1y, d1, inter, h).astype(compute_dtype)
    cx = _interp_matrix(t1x, d0, inter, w).astype(compute_dtype)
    img = images.astype(compute_dtype)
    tmp = jnp.einsum("boh,bhwc->bowc", ry, img, preferred_element_type=jnp.float32)
    return jnp.einsum(
        "bxw,bowc->boxc", cx, tmp.astype(compute_dtype), preferred_element_type=jnp.float32
    )


def affine_crop_mxu(images, trans, out_hw, inter: int = 328, row_block: int = 16,
                    compute_dtype=jnp.bfloat16):
    """General batched bilinear affine crop on the MXU (no gathers).

    Same signature/semantics as ``affine_crop``.  Requires
    max(out_h, out_w) <= hypot(out_h, out_w) <= inter - 4.

    :param inter: static intermediate patch edge (default 328 covers
        256x192 crops under any rotation: hypot = 320)
    :param row_block: output rows per scanned stage-2 block
    :param compute_dtype: matmul element type; bf16 weight error (~2^-8) is
        below cv2's own 1/32 fixed-point interpolation grid
    """
    b, h, w, c = images.shape
    oh, ow = out_hw
    assert (oh**2 + ow**2) ** 0.5 <= inter - 4, "intermediate too small for this crop size"
    assert oh % row_block == 0, "row_block must divide out_h"
    d0, d1, r_mat, u0, t1x, t1y = decompose_affine(trans, out_hw, inter)
    inter_c = stage1_resample(images, d0, d1, t1x, t1y, inter, compute_dtype).astype(compute_dtype)

    # ---- stage 2: rotation resample via one-hot matmuls, scanned over row blocks
    xs = jnp.arange(ow, dtype=jnp.float32)
    n_blocks = oh // row_block

    def block(carry, blk):
        y_start = blk * row_block
        ys_blk = y_start + jnp.arange(row_block, dtype=jnp.float32)
        # u = R [x, y] + u0 for the block grid
        ux = (
            r_mat[:, 0, 0, None, None] * xs[None, None, :]
            + r_mat[:, 0, 1, None, None] * ys_blk[None, :, None]
            + u0[:, 0, None, None]
        )  # [B, row_block, ow]
        uy = (
            r_mat[:, 1, 0, None, None] * xs[None, None, :]
            + r_mat[:, 1, 1, None, None] * ys_blk[None, :, None]
            + u0[:, 1, None, None]
        )
        q = row_block * ow
        v = _onehot_lerp(ux.reshape(b, q), inter, compute_dtype)  # [B, q, inter] (x taps)
        u_m = _onehot_lerp(uy.reshape(b, q), inter, compute_dtype)  # [B, q, inter] (y taps)
        # contract x taps: P[b, h, q, c] = sum_w I[b, h, w, c] V[b, q, w]
        p = jnp.einsum("bhwc,bqw->bhqc", inter_c, v, preferred_element_type=jnp.float32)
        # pick y taps per output pixel: out[b, q, c] = sum_h U[b, q, h] P[b, h, q, c]
        out = jnp.einsum("bqh,bhqc->bqc", u_m, p.astype(compute_dtype), preferred_element_type=jnp.float32)
        return carry, out.reshape(b, row_block, ow, c)

    _, blocks = lax.scan(block, 0, jnp.arange(n_blocks))
    # [n_blocks, B, row_block, ow, c] -> [B, oh, ow, c]
    return blocks.transpose(1, 0, 2, 3, 4).reshape(b, oh, ow, c)
