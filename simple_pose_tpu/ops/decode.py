"""On-device keypoint decoders: heatmap -> sub-pixel image coordinates.

Batched, jittable replacements for the reference decoders
(metrics/pose_metrics.py:10-107):

  * heatmap_to_coords      -> BasicKeyPointDecoder.heat_map_to_axis (:12-24)
  * decode_basic           -> BasicKeyPointDecoder.__call__ (:26-52):
      argmax + 0.25px shift toward the higher neighbor + inverse affine
  * decode_gauss_taylor    -> GaussTaylorKeyPointDecoder.__call__ (:62-107),
      the DarkPose decoder: depthwise 11x11 Gaussian blur, renormalize to the
      pre-blur max, log, finite-difference gradient/Hessian at the peak,
      Newton step -H^-1 grad (closed-form 2x2 inverse instead of batched
      torch .inverse()), masked where the Hessian is singular or the peak is
      too close to the border.

All gathers are jnp.take_along_axis on the flattened H*W axis; scatter-style
masked updates become jnp.where.  Everything runs in float32.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

__all__ = [
    "gaussian_kernel_1d",
    "heatmap_to_coords",
    "decode_basic",
    "decode_gauss_taylor",
    "decode_dark_original",
    "apply_trans_inv",
]


# cv2.getGaussianKernel fixed binomial tables for small even-symmetric kernels
_SMALL_GAUSSIAN_TAB = {
    1: np.array([1.0]),
    3: np.array([0.25, 0.5, 0.25]),
    5: np.array([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.array([0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125]),
}


def gaussian_kernel_1d(ksize: int, sigma: float = 0.0):
    """cv2.getGaussianKernel semantics: sigma<=0 derives sigma from ksize,
    and kernel sizes <= 7 use the fixed binomial tables."""
    if sigma <= 0 and ksize in _SMALL_GAUSSIAN_TAB:
        k = _SMALL_GAUSSIAN_TAB[ksize]
    else:
        if sigma <= 0:
            sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
        xs = np.arange(ksize, dtype=np.float64) - (ksize - 1) * 0.5
        k = np.exp(-(xs**2) / (2.0 * sigma**2))
        k = k / np.sum(k)
    return jnp.asarray(k, dtype=jnp.float32)


def heatmap_to_coords(heat):
    """Per-map argmax -> (x, y) coords and peak value.

    :param heat: [B, C, H, W]
    :returns: (coords [B, C, 2] float32, max_val [B, C, 1] float32)
    Coords are zeroed where the peak value is <= 0 (pose_metrics.py:23).
    """
    b, c, h, w = heat.shape
    flat = heat.reshape(b, c, h * w)
    idx = jnp.argmax(flat, axis=-1)
    max_val = jnp.max(flat, axis=-1, keepdims=True)
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    coords = jnp.stack([x, y], axis=-1)
    coords = coords * (max_val > 0.0).astype(jnp.float32)
    return coords, max_val


def apply_trans_inv(coords, trans_inv):
    """Map [B, C, 2] heatmap coords through per-sample 2x3 inverse affines.

    einsum parity with pose_metrics.py:51: out[b,c,a] = sum_d xyz[b,c,d] * T[b,a,d].
    """
    xyz = jnp.concatenate([coords, jnp.ones_like(coords[..., :1])], axis=-1)
    return jnp.einsum("bcd,bad->bca", xyz, trans_inv)


def decode_basic(heat, trans_inv):
    """Argmax + quarter-pixel shift decoder (pose_metrics.py:26-52)."""
    heat = heat.astype(jnp.float32)
    b, c, h, w = heat.shape
    coords, max_val = heatmap_to_coords(heat)
    x = coords[..., 0].astype(jnp.int32)
    y = coords[..., 1].astype(jnp.int32)
    valid = (x > 1) & (x < w - 1) & (y > 1) & (y < h - 1)

    flat = heat.reshape(b, c, h * w)
    xc = jnp.clip(x, 1, w - 2)
    yc = jnp.clip(y, 1, h - 2)
    # one batched gather of the 4 neighbor taps
    idx = jnp.stack([yc * w + xc + 1, yc * w + xc - 1,
                     (yc + 1) * w + xc, (yc - 1) * w + xc], axis=-1)
    v = jnp.take_along_axis(flat, idx, axis=-1)
    diff_x = jnp.sign(v[..., 0] - v[..., 1])
    diff_y = jnp.sign(v[..., 2] - v[..., 3])
    shift = jnp.stack([diff_x, diff_y], axis=-1) * 0.25
    coords = jnp.where(valid[..., None], coords + shift, coords)
    return apply_trans_inv(coords, trans_inv), max_val


def _blur(heat, ksize):
    """Depthwise Gaussian blur + pre/post maxes (pose_metrics.py:68-71).

    Returns (blur [B,C,H,W], ori_max [B,C], blur_max [B,C]).  The renorm
    (* ori_max / blur_max), clamp and log are applied lazily at the gathered
    Taylor taps in decode_gauss_taylor: elementwise functions commute with
    gather, so the decoded values are identical while the full-map log pass
    (~0.6 ms at batch 128 on v5e) disappears.
    """
    b, c, h, w = heat.shape
    k1 = gaussian_kernel_1d(ksize)
    pad = (ksize - 1) // 2
    # Separable depthwise blur as two grouped convs over a merged B*C axis.
    x = heat.reshape(b * c, 1, h, w)
    kx = k1.reshape(1, 1, 1, ksize)
    ky = k1.reshape(1, 1, ksize, 1)
    dn = lax.conv_dimension_numbers(x.shape, kx.shape, ("NCHW", "OIHW", "NCHW"))
    x = lax.conv_general_dilated(x, kx, (1, 1), [(0, 0), (pad, pad)], dimension_numbers=dn)
    x = lax.conv_general_dilated(x, ky, (1, 1), [(pad, pad), (0, 0)], dimension_numbers=dn)
    blur = x.reshape(b, c, h, w)
    ori_max = jnp.max(heat.reshape(b, c, -1), axis=-1)
    blur_max = jnp.max(blur.reshape(b, c, -1), axis=-1)
    return blur, ori_max, blur_max


def decode_gauss_taylor(heat, trans_inv, ksize: int = 11):
    """DarkPose Gauss-Taylor decoder (pose_metrics.py:55-107)."""
    heat = heat.astype(jnp.float32)
    b, c, h, w = heat.shape
    coords, max_val = heatmap_to_coords(heat)
    blur, ori_max, blur_max = _blur(heat, ksize)
    flat = blur.reshape(b, c, h * w)

    x = coords[..., 0].astype(jnp.int32)
    y = coords[..., 1].astype(jnp.int32)
    valid = (x > 1) & (x < w - 2) & (y > 1) & (y < h - 2)
    xc = jnp.clip(x, 2, w - 3)
    yc = jnp.clip(y, 2, h - 3)

    # one batched gather of all 9 Taylor taps, then the renorm+clamp+log
    # chain on just those values (same op order as the full-map version:
    # (v * ori_max) / blur_max -> clamp -> log, so results are bit-equal)
    taps = [(1, 0), (-1, 0), (0, 1), (0, -1), (2, 0), (-2, 0),
            (1, 1), (1, -1), (-1, 1), (-1, -1), (0, 2), (0, -2), (0, 0)]
    idx = jnp.stack([(yc + dy) * w + (xc + dx) for dx, dy in taps], axis=-1)  # [B,C,13]
    vals = jnp.take_along_axis(flat, idx, axis=-1)
    vals = jnp.log(jnp.clip(vals * ori_max[..., None] / blur_max[..., None], min=1e-10))
    tap = {t: vals[..., i] for i, t in enumerate(taps)}
    g = lambda dx, dy: tap[(dx, dy)]
    dx_ = 0.5 * (g(1, 0) - g(-1, 0))
    dy_ = 0.5 * (g(0, 1) - g(0, -1))
    dxx = 0.25 * (g(2, 0) - 2.0 * g(0, 0) + g(-2, 0))
    dxy = 0.25 * (g(1, 1) - g(1, -1) - g(-1, 1) + g(-1, -1))
    dyy = 0.25 * (g(0, 2) - 2.0 * g(0, 0) + g(0, -2))

    det = dxx * dyy - dxy * dxy
    solvable = det != 0.0
    safe_det = jnp.where(solvable, det, 1.0)
    # offset = -H^-1 @ grad with H = [[dxx, dxy], [dxy, dyy]]
    off_x = -(dyy * dx_ - dxy * dy_) / safe_det
    off_y = -(-dxy * dx_ + dxx * dy_) / safe_det
    update = valid & solvable
    new_x = jnp.maximum(coords[..., 0] + off_x, 0.0)
    new_y = jnp.maximum(coords[..., 1] + off_y, 0.0)
    coords = jnp.where(
        update[..., None], jnp.stack([new_x, new_y], axis=-1), coords
    )
    return apply_trans_inv(coords, trans_inv), max_val


def decode_dark_original(heat, trans_inv, ksize: int = 11):
    """Host-side DarkPose decoder: behavior of the reference's third public
    decoder, DarkPoseOriginalKeyPointDecoder (pose_metrics.py:110-169).

    Kept as loop numpy/cv2 deliberately -- it is the published DarkPose
    reference algorithm, exposed (decoder='dark_original' in the eval
    workflows) so the batched on-device ``decode_gauss_taylor`` can be
    cross-checked against it on real data.  Differences from the batched
    decoder that make it NOT bit-identical: cv2.GaussianBlur on a
    zero-padded float64 map, and the Taylor offset is applied WITHOUT the
    clamp-to->=0 that the batched variant carries over from
    GaussTaylorKeyPointDecoder (pose_metrics.py:99 vs :131).
    """
    import cv2 as cv

    heat = np.asarray(heat, dtype=np.float32)
    trans_inv = np.asarray(trans_inv, dtype=np.float32)
    b, c, h, w = heat.shape
    flat = heat.reshape(b, c, -1)
    peak_idx = flat.argmax(-1)
    max_val = flat.max(-1)
    coords = np.stack([(peak_idx % w).astype(np.float32),
                       np.floor(peak_idx / w).astype(np.float32)], axis=-1)
    coords *= (max_val > 0)[..., None]

    pad = (ksize - 1) // 2
    # f64 blur on a zero-padded map, downcast to f32 BEFORE the renorm and
    # log (the reference round-trips through a float32 array there)
    logmaps = np.empty((b, c, h, w), dtype=np.float32)
    for i in range(b):
        for j in range(c):
            padded = np.zeros((h + 2 * pad, w + 2 * pad))
            padded[pad:-pad, pad:-pad] = heat[i, j]
            blurred = cv.GaussianBlur(padded, (ksize, ksize), 0)[pad:-pad, pad:-pad]
            blurred = blurred.astype(np.float32)
            blurred *= heat[i, j].max() / blurred.max()
            logmaps[i, j] = np.log(np.maximum(blurred, np.float32(1e-10)))

    for i in range(b):
        for j in range(c):
            px, py = int(coords[i, j, 0]), int(coords[i, j, 1])
            if not (1 < px < w - 2 and 1 < py < h - 2):
                continue
            lm = logmaps[i, j]
            gx = 0.5 * (lm[py, px + 1] - lm[py, px - 1])
            gy = 0.5 * (lm[py + 1, px] - lm[py - 1, px])
            gxx = 0.25 * (lm[py, px + 2] - 2 * lm[py, px] + lm[py, px - 2])
            gxy = 0.25 * (lm[py + 1, px + 1] - lm[py - 1, px + 1]
                          - lm[py + 1, px - 1] + lm[py - 1, px - 1])
            gyy = 0.25 * (lm[py + 2, px] - 2 * lm[py, px] + lm[py - 2, px])
            det = gxx * gyy - gxy * gxy
            if det != 0.0:
                # -H^-1 @ grad, closed form
                coords[i, j, 0] += -(gyy * gx - gxy * gy) / det
                coords[i, j, 1] += -(-gxy * gx + gxx * gy) / det

    xyz = np.concatenate([coords, np.ones_like(coords[..., :1])], axis=-1)
    return np.einsum("bcd,bad->bca", xyz, trans_inv), max_val[..., None]


def instance_scores(max_val):
    """Reference scoring rule: mean(conf) + max(conf) per instance
    (pose_metrics.py:176)."""
    return jnp.mean(max_val[..., 0], axis=-1) + jnp.max(max_val[..., 0], axis=-1)
