"""Affine crop vs cv2.warpAffine goldens."""

import numpy as np
import jax.numpy as jnp
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.ops import affine as A
from simple_pose_tpu.ops import warp as W


def _smooth_image(rng, h=480, w=640, c=3):
    """Low-frequency image: keeps cv2's 5-bit fixed-point quantization small."""
    small = rng.uniform(0, 255, size=(h // 8, w // 8, c)).astype(np.float32)
    img = cv.resize(small, (w, h), interpolation=cv.INTER_CUBIC)
    return np.clip(img, 0, 255).astype(np.uint8)


def _crop_trans(rng, rot_range=(-40, 40)):
    center = rng.uniform(100, 540, size=2).astype(np.float32)
    width = rng.uniform(50, 400)
    scale = np.array([width, width * 256 / 192], np.float32) * 1.25
    rot = float(rng.uniform(*rot_range))
    trans, _ = A.get_affine_transform(center, scale, rot, (192, 256))
    return trans


@pytest.mark.parametrize("rot", [True, False])
def test_affine_crop_matches_cv2(rot):
    rng = np.random.default_rng(0 if rot else 1)
    imgs, transes, refs = [], [], []
    for _ in range(4):
        img = _smooth_image(rng)
        trans = _crop_trans(rng, (-40, 40) if rot else (0, 0))
        ref = cv.warpAffine(img, trans, (192, 256), flags=cv.INTER_LINEAR)
        imgs.append(img)
        transes.append(trans.astype(np.float32))
        refs.append(ref.astype(np.float32))
    got = W.affine_crop(jnp.asarray(np.stack(imgs)), jnp.asarray(np.stack(transes)), (256, 192))
    got = np.asarray(got)
    # cv2 uses 5-bit fixed-point interpolation weights; exact float differs
    # by a fraction of a level on smooth images.
    assert np.abs(got - np.stack(refs)).mean() < 0.5
    assert np.abs(got - np.stack(refs)).max() < 4.0


def test_separable_matches_general_axis_aligned():
    rng = np.random.default_rng(2)
    imgs = np.stack([rng.uniform(0, 255, size=(480, 640, 3)).astype(np.uint8) for _ in range(3)])
    transes = np.stack([_crop_trans(rng, (0, 0)).astype(np.float32) for _ in range(3)])
    general = np.asarray(W.affine_crop(jnp.asarray(imgs), jnp.asarray(transes), (256, 192)))
    separable = np.asarray(W.affine_crop_separable(jnp.asarray(imgs), jnp.asarray(transes), (256, 192)))
    np.testing.assert_allclose(separable, general, atol=1e-2)


def test_zero_border_outside_image():
    img = np.full((1, 100, 100, 3), 200, dtype=np.uint8)
    # crop centered far outside the image
    trans, _ = A.get_affine_transform(np.array([500.0, 500.0]), np.array([50.0, 66.7]), 0, (192, 256))
    out = np.asarray(W.affine_crop(jnp.asarray(img), jnp.asarray(trans.astype(np.float32))[None], (256, 192)))
    assert out.max() == 0.0
    out2 = np.asarray(
        W.affine_crop_separable(jnp.asarray(img), jnp.asarray(trans.astype(np.float32))[None], (256, 192))
    )
    assert out2.max() == 0.0


def test_partial_border_matches_cv2():
    rng = np.random.default_rng(3)
    img = _smooth_image(rng, 200, 200)
    # crop straddling the top-left corner
    trans, _ = A.get_affine_transform(np.array([10.0, 10.0]), np.array([150.0, 200.0]), 25.0, (192, 256))
    ref = cv.warpAffine(img, trans, (192, 256), flags=cv.INTER_LINEAR).astype(np.float32)
    got = np.asarray(W.affine_crop(jnp.asarray(img)[None], jnp.asarray(trans.astype(np.float32))[None], (256, 192)))[0]
    assert np.abs(got - ref).mean() < 0.5


def test_identity_crop_is_exact():
    rng = np.random.default_rng(4)
    img = rng.uniform(0, 255, size=(1, 256, 192, 3)).astype(np.uint8)
    ident = np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], dtype=np.float32)
    got = np.asarray(W.affine_crop(jnp.asarray(img), jnp.asarray(ident), (256, 192)))
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-4)
    got2 = np.asarray(W.affine_crop_separable(jnp.asarray(img), jnp.asarray(ident), (256, 192)))
    np.testing.assert_allclose(got2, img.astype(np.float32), atol=1e-4)


def test_invert_affine_batch():
    rng = np.random.default_rng(5)
    ms = np.stack([_crop_trans(rng).astype(np.float32) for _ in range(5)])
    inv = np.asarray(W.invert_affine_batch(jnp.asarray(ms)))
    for i in range(5):
        np.testing.assert_allclose(inv[i], A.invert_affine(ms[i]), atol=1e-4)


def test_mxu_crop_axis_aligned_matches_general():
    rng = np.random.default_rng(6)
    imgs = np.stack([_smooth_image(rng) for _ in range(2)])
    transes = np.stack([_crop_trans(rng, (0, 0)).astype(np.float32) for _ in range(2)])
    general = np.asarray(W.affine_crop(jnp.asarray(imgs), jnp.asarray(transes), (256, 192)))
    mxu = np.asarray(
        W.affine_crop_mxu(jnp.asarray(imgs), jnp.asarray(transes), (256, 192), compute_dtype=jnp.float32)
    )
    np.testing.assert_allclose(mxu, general, atol=0.05)


def test_mxu_crop_rotated_close_to_general():
    rng = np.random.default_rng(7)
    imgs = np.stack([_smooth_image(rng) for _ in range(2)])
    transes = np.stack([_crop_trans(rng, (-40, 40)).astype(np.float32) for _ in range(2)])
    general = np.asarray(W.affine_crop(jnp.asarray(imgs), jnp.asarray(transes), (256, 192)))
    mxu = np.asarray(
        W.affine_crop_mxu(jnp.asarray(imgs), jnp.asarray(transes), (256, 192), compute_dtype=jnp.float32)
    )
    # double bilinear resample vs single: ~1.5 intensity levels mean (0.6% of
    # range) -- pixel smoothing only; crop geometry and heatmap targets are
    # matrix-exact, and this path is used for train-time augmentation only
    # (eval transforms are axis-aligned and hit the exact stage-1-only path).
    assert np.abs(mxu - general).mean() < 2.5


def test_mxu_crop_zero_border():
    img = np.full((1, 100, 100, 3), 200, dtype=np.uint8)
    trans, _ = A.get_affine_transform(np.array([500.0, 500.0]), np.array([50.0, 66.7]), 20.0, (192, 256))
    out = np.asarray(
        W.affine_crop_mxu(jnp.asarray(img), jnp.asarray(trans.astype(np.float32))[None], (256, 192),
                          compute_dtype=jnp.float32)
    )
    assert np.abs(out).max() < 1e-3
