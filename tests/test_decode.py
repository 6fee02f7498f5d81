"""Decoders vs loop-based oracles (DarkPose original decoder pattern)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.ops import decode as D
from simple_pose_tpu.ops import heatmap as H


def _rand_heatmaps(rng, b=3, c=17, h=64, w=48):
    """Plausible peaky heatmaps: rendered Gaussians + noise."""
    joints = np.zeros((b, c, 3), dtype=np.float32)
    joints[..., 0] = rng.uniform(0, w - 1, size=(b, c))
    joints[..., 1] = rng.uniform(0, h - 1, size=(b, c))
    joints[..., 2] = 1.0
    maps, _ = H.encode_unbiased(jnp.asarray(joints), shape=(h, w))
    maps = np.asarray(maps) + rng.normal(0, 0.01, size=(b, c, h, w)).astype(np.float32)
    return maps.astype(np.float32)


def _rand_trans_inv(rng, b):
    out = np.zeros((b, 2, 3), dtype=np.float32)
    for i in range(b):
        ang = rng.uniform(-0.5, 0.5)
        s = rng.uniform(2, 8)
        out[i, 0] = [s * np.cos(ang), -s * np.sin(ang), rng.uniform(0, 100)]
        out[i, 1] = [s * np.sin(ang), s * np.cos(ang), rng.uniform(0, 100)]
    return out


def _oracle_coords(heat):
    b, c, h, w = heat.shape
    flat = heat.reshape(b, c, -1)
    idx = flat.argmax(-1)
    val = flat.max(-1)
    coords = np.stack([(idx % w).astype(np.float64), np.floor(idx / w)], -1)
    coords = coords * (val > 0)[..., None]
    return coords, val


def _oracle_basic(heat, trans_inv):
    """Loop oracle for BasicKeyPointDecoder (pose_metrics.py:26-52)."""
    b, c, h, w = heat.shape
    coords, val = _oracle_coords(heat)
    for n in range(b):
        for p in range(c):
            x, y = int(coords[n, p, 0]), int(coords[n, p, 1])
            if 1 < x < w - 1 and 1 < y < h - 1:
                dx = np.sign(heat[n, p, y, x + 1] - heat[n, p, y, x - 1])
                dy = np.sign(heat[n, p, y + 1, x] - heat[n, p, y - 1, x])
                coords[n, p] += np.array([dx, dy]) * 0.25
    xyz = np.concatenate([coords, np.ones_like(coords[..., :1])], -1)
    return np.einsum("bcd,bad->bca", xyz, trans_inv.astype(np.float64)), val


def _oracle_gauss_taylor(heat, trans_inv, ksize=11):
    """Loop oracle mirroring DarkPoseOriginalKeyPointDecoder
    (pose_metrics.py:110-169): cv2.GaussianBlur on a zero-padded map,
    renormalize, log, per-peak Taylor refinement."""
    heat = heat.copy()
    b, c, h, w = heat.shape
    coords, val = _oracle_coords(heat)
    border = (ksize - 1) // 2
    for i in range(b):
        for j in range(c):
            origin_max = np.max(heat[i, j])
            dr = np.zeros((h + 2 * border, w + 2 * border))
            dr[border:-border, border:-border] = heat[i, j].copy()
            dr = cv.GaussianBlur(dr, (ksize, ksize), 0)
            heat[i, j] = dr[border:-border, border:-border].copy()
            heat[i, j] *= origin_max / np.max(heat[i, j])
    hm = np.log(np.maximum(heat, 1e-10))
    for n in range(b):
        for p in range(c):
            px, py = int(coords[n, p, 0]), int(coords[n, p, 1])
            if 1 < px < w - 2 and 1 < py < h - 2:
                dx = 0.5 * (hm[n, p, py, px + 1] - hm[n, p, py, px - 1])
                dy = 0.5 * (hm[n, p, py + 1, px] - hm[n, p, py - 1, px])
                dxx = 0.25 * (hm[n, p, py, px + 2] - 2 * hm[n, p, py, px] + hm[n, p, py, px - 2])
                dxy = 0.25 * (hm[n, p, py + 1, px + 1] - hm[n, p, py - 1, px + 1]
                              - hm[n, p, py + 1, px - 1] + hm[n, p, py - 1, px - 1])
                dyy = 0.25 * (hm[n, p, py + 2, px] - 2 * hm[n, p, py, px] + hm[n, p, py - 2, px])
                det = dxx * dyy - dxy**2
                if det != 0:
                    hinv = np.linalg.inv(np.array([[dxx, dxy], [dxy, dyy]]))
                    offset = -hinv @ np.array([dx, dy])
                    coords[n, p] = np.maximum(coords[n, p] + offset, 0.0)
    xyz = np.concatenate([coords, np.ones_like(coords[..., :1])], -1)
    return np.einsum("bcd,bad->bca", xyz, trans_inv.astype(np.float64)), val


def test_gaussian_kernel_matches_cv2():
    for ksize in (5, 11, 13):
        ref = cv.getGaussianKernel(ksize, 0).reshape(-1)
        got = np.asarray(D.gaussian_kernel_1d(ksize))
        np.testing.assert_allclose(got, ref, atol=1e-7)


def test_heatmap_to_coords():
    rng = np.random.default_rng(0)
    heat = _rand_heatmaps(rng)
    coords, val = D.heatmap_to_coords(jnp.asarray(heat))
    ref_coords, ref_val = _oracle_coords(heat)
    np.testing.assert_allclose(np.asarray(coords), ref_coords, atol=0)
    np.testing.assert_allclose(np.asarray(val)[..., 0], ref_val, atol=0)


def test_heatmap_to_coords_nonpositive_peak():
    heat = -np.ones((1, 2, 8, 8), dtype=np.float32)
    coords, val = D.heatmap_to_coords(jnp.asarray(heat))
    assert np.all(np.asarray(coords) == 0.0)


def test_basic_decoder_matches_oracle():
    rng = np.random.default_rng(1)
    heat = _rand_heatmaps(rng)
    ti = _rand_trans_inv(rng, heat.shape[0])
    got, gval = D.decode_basic(jnp.asarray(heat), jnp.asarray(ti))
    ref, rval = _oracle_basic(heat, ti)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gval)[..., 0], rval, atol=1e-6)


def test_gauss_taylor_matches_oracle():
    rng = np.random.default_rng(2)
    heat = _rand_heatmaps(rng)
    ti = _rand_trans_inv(rng, heat.shape[0])
    got, gval = D.decode_gauss_taylor(jnp.asarray(heat), jnp.asarray(ti))
    ref, rval = _oracle_gauss_taylor(heat, ti)
    # sub-pixel offsets agree to ~1e-2 px in crop space; scaled by trans_inv
    np.testing.assert_allclose(np.asarray(got), ref, atol=0.05)
    np.testing.assert_allclose(np.asarray(gval)[..., 0], rval, atol=1e-6)


def test_gauss_taylor_peak_at_border_passthrough():
    heat = np.zeros((1, 1, 64, 48), dtype=np.float32)
    heat[0, 0, 0, 0] = 1.0  # border peak: no refinement branch
    ti = np.tile(np.array([[1, 0, 0], [0, 1, 0]], np.float32), (1, 1, 1))
    got, _ = D.decode_gauss_taylor(jnp.asarray(heat), jnp.asarray(ti))
    np.testing.assert_allclose(np.asarray(got)[0, 0], [0.0, 0.0], atol=0)


def test_instance_scores():
    val = jnp.asarray(np.random.default_rng(3).uniform(0, 1, size=(2, 17, 1)).astype(np.float32))
    s = D.instance_scores(val)
    ref = np.asarray(val)[..., 0].mean(-1) + np.asarray(val)[..., 0].max(-1)
    np.testing.assert_allclose(np.asarray(s), ref, rtol=1e-6)


def test_gauss_taylor_adversarial_peaks():
    """Peaks at/near every border and exact corners: the batched gather must
    stay in-bounds and borders must pass through undisplaced (the reference
    only Taylor-refines peaks with 1 < p < size-2)."""
    h, w = 16, 12
    spots = [(0, 0), (w - 1, h - 1), (0, h - 1), (w - 1, 0), (1, 1), (2, 2),
             (w - 3, h - 3), (w - 2, 1), (5, 0), (0, 7), (6, 8)]
    heat = np.zeros((len(spots), 1, h, w), np.float32)
    for i, (x, y) in enumerate(spots):
        heat[i, 0, y, x] = 1.0
        # small neighborhood mass so blur has structure
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            xx, yy = x + dx, y + dy
            if 0 <= xx < w and 0 <= yy < h:
                heat[i, 0, yy, xx] = 0.4
    tri = np.tile(np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32), (len(spots), 1, 1))
    kps, conf = D.decode_gauss_taylor(jnp.asarray(heat), jnp.asarray(tri))
    kps = np.asarray(kps)
    assert np.all(np.isfinite(kps))
    for i, (x, y) in enumerate(spots):
        refinable = 1 < x < w - 2 and 1 < y < h - 2
        if not refinable:
            # border peaks: argmax passes through exactly
            np.testing.assert_allclose(kps[i, 0, :2], [x, y], atol=1e-5)
        else:
            assert abs(kps[i, 0, 0] - x) <= 1.0 and abs(kps[i, 0, 1] - y) <= 1.0


def test_dark_original_decoder_matches_oracle():
    """ops.decode_dark_original is the selectable host-side decoder
    (pose_metrics.py:110-169); it must match the loop oracle."""
    rng = np.random.default_rng(4)
    heat = _rand_heatmaps(rng)
    ti = _rand_trans_inv(rng, heat.shape[0])
    got, gval = D.decode_dark_original(heat, ti)
    ref, rval = _oracle_gauss_taylor(heat, ti)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gval)[..., 0], rval, atol=1e-6)
    # and it should agree closely with the batched on-device decoder
    jgot, _ = D.decode_gauss_taylor(jnp.asarray(heat), jnp.asarray(ti))
    np.testing.assert_allclose(np.asarray(jgot), got, atol=0.05)
