"""On-device Gaussian heatmap target encoding.

The reference renders targets per-sample on CPU dataloader workers
(commons/transforms.py:80-116 biased, :167-191 DarkPose-unbiased).  Here both
encoders are pure batched jnp: one broadcasted exp over [B, K, H, W], fused by
XLA into the training step, so target encoding never touches the host.

Semantics parity notes (vs RefineSimpleTransform.get_heat_map):
  * tmp_size = 3*sigma; bounds test uses python int() truncation on
    (mu - tmp_size) / (mu + tmp_size + 1); a joint whose Gaussian is fully
    out of bounds gets weight 0 and an all-zero map.
  * Maps are rendered only when vis > 0.5; weights keep the raw vis value
    for in-bounds joints.
  * The unbiased variant renders a dense Gaussian at the continuous
    (mu_x, mu_y); the biased variant snaps to int(mu/stride + 0.5) and only
    fills a (6*sigma+1)^2 window.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["encode_unbiased", "encode_biased"]


def _grids(shape, dtype=jnp.float32):
    h, w = shape
    ys = jnp.arange(h, dtype=dtype)[:, None]  # [H, 1]
    xs = jnp.arange(w, dtype=dtype)[None, :]  # [1, W]
    return ys, xs


def _in_bounds_weight(mu_x, mu_y, vis, w, h, tmp_size):
    # int() truncates toward zero -- jnp.trunc matches for the ranges used.
    ul_x = jnp.trunc(mu_x - tmp_size)
    ul_y = jnp.trunc(mu_y - tmp_size)
    br_x = jnp.trunc(mu_x + tmp_size + 1)
    br_y = jnp.trunc(mu_y + tmp_size + 1)
    oob = (ul_x >= w) | (ul_y >= h) | (br_x < 0) | (br_y < 0)
    weight = jnp.where(oob, 0.0, vis)
    return weight


def encode_unbiased(joints, shape=(64, 48), sigma=2.0):
    """DarkPose unbiased dense-Gaussian encoding.

    :param joints: [..., K, 3] (x, y, vis) in heatmap coordinates
    :param shape: (H, W) of the target maps
    :returns: (targets [..., K, H, W] float32, weights [..., K] float32)

    Mirrors commons/transforms.py:167-191.
    """
    h, w = shape
    joints = jnp.asarray(joints, dtype=jnp.float32)
    mu_x = joints[..., 0]
    mu_y = joints[..., 1]
    vis = joints[..., 2]
    tmp_size = sigma * 3.0

    weight = _in_bounds_weight(mu_x, mu_y, vis, w, h, tmp_size)
    render = (vis > 0.5) & (weight > 0.0)

    ys, xs = _grids((h, w))
    # [..., K, H, W]
    d2 = (xs - mu_x[..., None, None]) ** 2 + (ys - mu_y[..., None, None]) ** 2
    g = jnp.exp(-d2 / (2.0 * sigma**2))
    targets = jnp.where(render[..., None, None], g, 0.0)
    return targets, weight


def encode_biased(joints, shape=(64, 48), sigma=2.0, stride=4):
    """Classic biased encoding: snap the center to int(mu/stride + 0.5) and
    fill only a (6*sigma+1)^2 window around it.

    Mirrors commons/transforms.py:80-116 (BasicSimpleTransform.get_heat_map);
    note the reference passes joints already in *input* coordinates and
    divides by the stride here.
    """
    h, w = shape
    joints = jnp.asarray(joints, dtype=jnp.float32)
    mu_x = jnp.trunc(joints[..., 0] / stride + 0.5)
    mu_y = jnp.trunc(joints[..., 1] / stride + 0.5)
    vis = joints[..., 2]
    tmp_size = sigma * 3.0

    weight = _in_bounds_weight(mu_x, mu_y, vis, w, h, tmp_size)
    render = (vis > 0.5) & (weight > 0.0)

    ys, xs = _grids((h, w))
    dx = xs - mu_x[..., None, None]
    dy = ys - mu_y[..., None, None]
    g = jnp.exp(-(dx**2 + dy**2) / (2.0 * sigma**2))
    window = (jnp.abs(dx) <= tmp_size) & (jnp.abs(dy) <= tmp_size)
    targets = jnp.where(render[..., None, None] & window, g, 0.0)
    return targets, weight
