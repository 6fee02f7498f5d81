"""Heatmap encoders vs loop-based numpy oracles (reference semantics)."""

import numpy as np
import jax.numpy as jnp

from simple_pose_tpu.ops import heatmap as H


def _oracle_unbiased(joints, sigma=2.0, shape=(48, 64)):
    """Loop oracle with RefineSimpleTransform.get_heat_map semantics
    (shape is (w, h) like the reference)."""
    num_joints = joints.shape[0]
    weights = joints[:, 2].copy()
    targets = np.zeros((num_joints, shape[1], shape[0]), dtype=np.float32)
    tmp_size = sigma * 3
    for i in range(num_joints):
        mu_x, mu_y = joints[i, :2]
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= shape[0] or ul[1] >= shape[1] or br[0] < 0 or br[1] < 0:
            weights[i] = 0.0
            continue
        if weights[i] > 0.5:
            x, y = np.meshgrid(np.arange(shape[0]), np.arange(shape[1]))
            xy = np.stack([x, y], axis=-1)
            targets[i] = np.exp(-np.sum((xy - np.array([mu_x, mu_y])) ** 2, axis=-1) / (2 * sigma**2))
    return targets, weights


def _oracle_biased(joints, sigma=2.0, shape=(48, 64), stride=4):
    """Loop oracle with BasicSimpleTransform.get_heat_map semantics."""
    num_joints = joints.shape[0]
    weights = joints[:, 2].copy()
    targets = np.zeros((num_joints, shape[1], shape[0]), dtype=np.float32)
    tmp_size = sigma * 3
    for i in range(num_joints):
        mu_x = int(joints[i, 0] / stride + 0.5)
        mu_y = int(joints[i, 1] / stride + 0.5)
        ul = [int(mu_x - tmp_size), int(mu_y - tmp_size)]
        br = [int(mu_x + tmp_size + 1), int(mu_y + tmp_size + 1)]
        if ul[0] >= shape[0] or ul[1] >= shape[1] or br[0] < 0 or br[1] < 0:
            weights[i] = 0.0
            continue
        size = int(2 * tmp_size + 1)
        x = np.arange(0, size, 1, np.float32)
        y = x[:, np.newaxis]
        x0 = y0 = size // 2
        g = np.exp(-((x - x0) ** 2 + (y - y0) ** 2) / (2 * (sigma**2)))
        g_x = max(0, -ul[0]), min(br[0], shape[0]) - ul[0]
        g_y = max(0, -ul[1]), min(br[1], shape[1]) - ul[1]
        img_x = max(0, ul[0]), min(br[0], shape[0])
        img_y = max(0, ul[1]), min(br[1], shape[1])
        if weights[i] > 0.5:
            targets[i, img_y[0]:img_y[1], img_x[0]:img_x[1]] = g[g_y[0]:g_y[1], g_x[0]:g_x[1]]
    return targets, weights


def _rand_joints(rng, n=17):
    joints = np.zeros((n, 3), dtype=np.float32)
    joints[:, 0] = rng.uniform(-10, 58, size=n)  # includes out-of-bounds
    joints[:, 1] = rng.uniform(-10, 74, size=n)
    joints[:, 2] = (rng.uniform(size=n) > 0.3).astype(np.float32)
    return joints


def test_unbiased_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(10):
        joints = _rand_joints(rng)
        ref_t, ref_w = _oracle_unbiased(joints)
        got_t, got_w = H.encode_unbiased(jnp.asarray(joints), shape=(64, 48))
        np.testing.assert_allclose(np.asarray(got_t), ref_t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), ref_w, atol=0)


def test_biased_matches_oracle():
    rng = np.random.default_rng(1)
    for _ in range(10):
        joints = _rand_joints(rng)
        joints[:, 0] *= 4  # input-space coords for the biased variant
        joints[:, 1] *= 4
        ref_t, ref_w = _oracle_biased(joints)
        got_t, got_w = H.encode_biased(jnp.asarray(joints), shape=(64, 48))
        np.testing.assert_allclose(np.asarray(got_t), ref_t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_w), ref_w, atol=0)


def test_batched_shapes():
    rng = np.random.default_rng(2)
    joints = np.stack([_rand_joints(rng) for _ in range(4)])  # [4, 17, 3]
    t, w = H.encode_unbiased(jnp.asarray(joints), shape=(64, 48))
    assert t.shape == (4, 17, 64, 48)
    assert w.shape == (4, 17)
    for b in range(4):
        ref_t, ref_w = _oracle_unbiased(joints[b])
        np.testing.assert_allclose(np.asarray(t[b]), ref_t, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w[b]), ref_w, atol=0)
