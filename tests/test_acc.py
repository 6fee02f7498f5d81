"""heatmap_accuracy vs loop oracle (HeatMapAcc semantics)."""

import numpy as np
import jax.numpy as jnp

from simple_pose_tpu.metrics.acc import heatmap_accuracy


def _oracle(predicts, targets, thresh=0.5, norm_frac=10.0):
    b, c, h, w = predicts.shape

    def to_axis(hm):
        flat = hm.reshape(b, c, -1)
        idx = flat.argmax(-1)
        val = flat.max(-1)
        coords = np.stack([(idx % w).astype(np.float64), np.floor(idx / w)], -1)
        return coords * (val > 0)[..., None]

    preds = to_axis(predicts)
    labels = to_axis(targets)
    norm = np.array([w, h]) / norm_frac
    valid = (labels[..., 0] > 1) & (labels[..., 1] > 1)
    distance = np.linalg.norm(preds / norm - labels / norm, axis=-1)
    distance[~valid] = -1
    acc_sum, cnt = 0.0, 0
    for i in range(c):
        vm = valid[:, i]
        if vm.sum() < 1:
            continue
        acc_sum += (distance[:, i][vm] < thresh).sum() / vm.sum()
        cnt += 1
    return acc_sum / cnt if cnt > 0 else 0.0


def _peaky(rng, b=4, c=17, h=64, w=48):
    maps = np.zeros((b, c, h, w), dtype=np.float32)
    for i in range(b):
        for j in range(c):
            x, y = rng.integers(0, w), rng.integers(0, h)
            maps[i, j, y, x] = 1.0
    return maps


def test_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(5):
        pred = _peaky(rng)
        tgt = _peaky(rng)
        got = float(heatmap_accuracy(jnp.asarray(pred), jnp.asarray(tgt)))
        ref = _oracle(pred, tgt)
        np.testing.assert_allclose(got, ref, atol=1e-6)


def test_perfect_match_is_one():
    rng = np.random.default_rng(1)
    maps = _peaky(rng)
    # force labels into the valid region (>1)
    maps[..., :, :2] = 0
    maps[..., :2, :] = 0
    got = float(heatmap_accuracy(jnp.asarray(maps), jnp.asarray(maps)))
    assert got == 1.0


def test_all_invalid_labels_gives_zero():
    pred = np.zeros((2, 17, 64, 48), dtype=np.float32)
    tgt = np.zeros((2, 17, 64, 48), dtype=np.float32)
    tgt[:, :, 0, 0] = 1.0  # labels at (0,0): invalid
    assert float(heatmap_accuracy(jnp.asarray(pred), jnp.asarray(tgt))) == 0.0
