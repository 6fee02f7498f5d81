"""Layer primitives vs raw torch ops: pins down every layout convention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F

from simple_pose_tpu.models import layers as L


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)).copy())


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("stride,padding,groups", [(1, 1, 1), (2, 1, 1), (1, 0, 1), (2, 1, 4)])
def test_conv_matches_torch(stride, padding, groups):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 12, 8)).astype(np.float32)
    w_oihw = rng.normal(size=(12, 8 // groups, 3, 3)).astype(np.float32)
    mod = L.conv(12, 3, stride=stride, padding=padding, groups=groups)
    params = {"params": {"kernel": jnp.asarray(np.transpose(w_oihw, (2, 3, 1, 0)))}}
    got = mod.apply(params, jnp.asarray(x))
    ref = F.conv2d(_nchw(x), torch.from_numpy(w_oihw), stride=stride, padding=padding, groups=groups)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-4)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 6, 10)).astype(np.float32)
    w_iohw = rng.normal(size=(10, 7, 4, 4)).astype(np.float32)  # [in, out, kH, kW]
    mod = L.TorchConvTranspose(7, 4, 2, 1)
    params = {"params": {"kernel": jnp.asarray(np.transpose(w_iohw, (2, 3, 0, 1)))}}
    got = mod.apply(params, jnp.asarray(x))
    ref = F.conv_transpose2d(_nchw(x), torch.from_numpy(w_iohw), stride=2, padding=1)
    assert got.shape == (2, 16, 12, 7)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-4)


def test_batch_norm_inference_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 6, 5)).astype(np.float32)
    scale = rng.normal(size=5).astype(np.float32)
    bias = rng.normal(size=5).astype(np.float32)
    mean = rng.normal(size=5).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=5).astype(np.float32)
    mod = L.batch_norm(train=False)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    got = mod.apply(variables, jnp.asarray(x))
    ref = F.batch_norm(
        _nchw(x), torch.from_numpy(mean), torch.from_numpy(var),
        torch.from_numpy(scale), torch.from_numpy(bias), training=False, eps=1e-5,
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-5)


def test_batch_norm_training_stats_update():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, 4, 4, 3)).astype(np.float32)
    mod = L.batch_norm(train=True)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    _, updated = mod.apply(variables, jnp.asarray(x), mutable=["batch_stats"])
    # torch: new = (1 - momentum)*old + momentum*batch  (momentum=0.1)
    batch_mean = x.mean(axis=(0, 1, 2))
    np.testing.assert_allclose(
        np.asarray(updated["batch_stats"]["mean"]), 0.1 * batch_mean, atol=1e-5
    )


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 5, 7, 12)).astype(np.float32)  # 12 = 3 * 2^2
    got = L.pixel_shuffle(jnp.asarray(x), 2)
    ref = F.pixel_shuffle(_nchw(x), 2)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-6)


def test_max_pool_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 15, 11, 4)).astype(np.float32)
    got = L.max_pool_3x3_s2(jnp.asarray(x))
    ref = F.max_pool2d(_nchw(x), kernel_size=3, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-6)


def test_se_layer_matches_torch():
    rng = np.random.default_rng(6)
    c = 6
    x = rng.normal(size=(2, 4, 4, c)).astype(np.float32)
    w1 = rng.normal(size=(c, c, 1, 1)).astype(np.float32)
    b1 = rng.normal(size=c).astype(np.float32)
    w2 = rng.normal(size=(c, c, 1, 1)).astype(np.float32)
    b2 = rng.normal(size=c).astype(np.float32)
    mod = L.SELayer(c)
    variables = {
        "params": {
            "fc1": {"kernel": jnp.asarray(np.transpose(w1, (2, 3, 1, 0))), "bias": jnp.asarray(b1)},
            "fc2": {"kernel": jnp.asarray(np.transpose(w2, (2, 3, 1, 0))), "bias": jnp.asarray(b2)},
        }
    }
    got = mod.apply(variables, jnp.asarray(x))
    xt = _nchw(x)
    y = F.adaptive_avg_pool2d(xt, 1)
    y = F.conv2d(y, torch.from_numpy(w1), torch.from_numpy(b1))
    y = F.relu(y)
    y = F.conv2d(y, torch.from_numpy(w2), torch.from_numpy(b2))
    ref = xt * torch.sigmoid(y)
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=1e-5)
