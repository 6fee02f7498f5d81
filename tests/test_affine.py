"""Geometry core vs cv2 / reference-semantics goldens."""

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

from simple_pose_tpu.ops import affine as A


def _ref_get_affine_transform(center, scale, rot, output_size, shift=np.array([0, 0], np.float32)):
    """Reference-semantics construction using cv2.getAffineTransform as oracle."""
    scale_tmp = np.array(scale, dtype=np.float64)
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size
    rot_rad = np.pi * rot / 180
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    src_point = [0, src_w * -0.5]
    src_dir = [src_point[0] * cs - src_point[1] * sn, src_point[0] * sn + src_point[1] * cs]
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = np.array(center) + scale_tmp * shift
    src[1, :] = np.array(center) + np.array(src_dir) + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], dtype=np.float32)

    src[2:, :] = third(src[0, :], src[1, :])
    dst[2:, :] = third(dst[0, :], dst[1, :])
    trans = cv.getAffineTransform(np.float32(src), np.float32(dst))
    trans_inv = cv.getAffineTransform(np.float32(dst), np.float32(src))
    return trans, trans_inv


@pytest.mark.parametrize("seed", range(8))
def test_get_affine_transform_matches_cv2(seed):
    rng = np.random.default_rng(seed)
    center = rng.uniform(50, 500, size=2).astype(np.float32)
    w = rng.uniform(20, 300)
    scale = np.array([w, w * 256 / 192], dtype=np.float32) * 1.25
    rot = float(rng.uniform(-40, 40))
    trans, trans_inv = A.get_affine_transform(center, scale, rot, (192, 256))
    ref_t, ref_ti = _ref_get_affine_transform(center, scale, rot, (192, 256))
    np.testing.assert_allclose(trans, ref_t, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(trans_inv, ref_ti, rtol=1e-4, atol=1e-3)


def test_solve_affine_exact():
    rng = np.random.default_rng(0)
    src = rng.uniform(0, 100, size=(3, 2))
    dst = rng.uniform(0, 100, size=(3, 2))
    m = A.solve_affine(src, dst)
    got = np.concatenate([src, np.ones((3, 1))], axis=1) @ m.T
    np.testing.assert_allclose(got, dst, atol=1e-9)


def test_invert_and_compose():
    rng = np.random.default_rng(1)
    center = rng.uniform(50, 500, size=2)
    scale = np.array([100.0, 133.3])
    trans, trans_inv = A.get_affine_transform(center, scale, 17.0, (192, 256))
    np.testing.assert_allclose(A.invert_affine(trans), trans_inv, atol=1e-8)
    ident = A.compose_affine(trans_inv, trans)
    np.testing.assert_allclose(ident, np.array([[1, 0, 0], [0, 1, 0]], dtype=np.float64), atol=1e-8)


def test_box_to_center_scale_snap():
    # w > ar*h: grow h
    c, s = A.box_to_center_scale(10, 20, 100, 50, aspect_ratio=0.75)
    np.testing.assert_allclose(c, [60, 45])
    np.testing.assert_allclose(s, [100 * 1.25, 100 / 0.75 * 1.25], rtol=1e-6)
    # w < ar*h: grow w
    c, s = A.box_to_center_scale(0, 0, 30, 100, aspect_ratio=0.75)
    np.testing.assert_allclose(s, [75 * 1.25, 100 * 1.25], rtol=1e-6)
    # roundtrip
    box = A.center_scale_to_box(c, s)
    c2, s2 = A.box_to_center_scale(box[0], box[1], box[2] - box[0], box[3] - box[1], 0.75, scale_mult=1.0)
    np.testing.assert_allclose(c2, c, rtol=1e-6)
    np.testing.assert_allclose(s2, s, rtol=1e-6)


def test_affine_transform_joints_only_moves_visible():
    joints = np.array([[10.0, 20.0, 1.0], [5.0, 5.0, 0.0]], dtype=np.float32)
    m = np.array([[2.0, 0.0, 1.0], [0.0, 2.0, -1.0]])
    out = A.affine_transform_joints(joints, m)
    np.testing.assert_allclose(out[0], [21.0, 39.0, 1.0])
    np.testing.assert_allclose(out[1], [5.0, 5.0, 0.0])


def test_flip_joints_pairs():
    joints = np.arange(17 * 3, dtype=np.float32).reshape(17, 3)
    joints[:, 2] = 1.0
    pairs = [[1, 2], [3, 4], [5, 6], [7, 8], [9, 10], [11, 12], [13, 14], [15, 16]]
    out = A.flip_joints(joints, width=100, joint_pairs=pairs)
    # joint 1 now holds (flipped) old joint 2
    np.testing.assert_allclose(out[1, 0], 100 - joints[2, 0] - 1)
    np.testing.assert_allclose(out[2, 0], 100 - joints[1, 0] - 1)
    np.testing.assert_allclose(out[0, 0], 100 - joints[0, 0] - 1)
    np.testing.assert_allclose(out[:, 1], [joints[j, 1] for j in [0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15]])


def test_hflip_affine_matches_fliplr_sampling():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, size=(8, 16)).astype(np.float32)
    flipped = np.fliplr(img)
    m = A.hflip_affine(img.shape[1])
    # sampling flipped at integer (x, y) == sampling img at M @ (x, y)
    for x in range(16):
        src = m[:, :2] @ np.array([x, 3.0]) + m[:, 2]
        assert flipped[3, x] == img[int(src[1]), int(src[0])]


def test_box_jitter_bounds():
    rng = np.random.default_rng(3)
    for _ in range(200):
        out = A.box_jitter([50, 60, 200, 300], 640, 480, rng)
        assert out[2] > out[0] and out[3] > out[1]
