"""Fused folded-Bottleneck chain kernel (ops/pallas_bottleneck.py) parity:
the Pallas lowering (interpret mode on CPU), the XLA reference lowering and
the REAL flax Bottleneck eval forward (with BN folded by fold_conv_bn) must
all agree."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_pose_tpu.models.resnet import Bottleneck
from simple_pose_tpu.ops.pallas_bottleneck import (
    bottleneck_chain_pallas,
    bottleneck_chain_xla,
    fold_conv_bn,
)


def _rand_block(rng, cin, width, cout, downsample):
    blk = {
        "w1": rng.normal(0, 0.1, (cin, width)).astype(np.float32),
        "b1": rng.normal(0, 0.1, width).astype(np.float32),
        "w2": rng.normal(0, 0.1, (3, 3, width, width)).astype(np.float32),
        "b2": rng.normal(0, 0.1, width).astype(np.float32),
        "w3": rng.normal(0, 0.1, (width, cout)).astype(np.float32),
        "b3": rng.normal(0, 0.1, cout).astype(np.float32),
    }
    if downsample:
        blk["wd"] = rng.normal(0, 0.1, (cin, cout)).astype(np.float32)
        blk["bd"] = rng.normal(0, 0.1, cout).astype(np.float32)
    else:
        blk["wd"] = None
    return blk


@pytest.fixture(scope="module")
def chain():
    rng = np.random.default_rng(0)
    blocks = [
        _rand_block(rng, 16, 8, 32, downsample=True),
        _rand_block(rng, 32, 8, 32, downsample=False),
    ]
    x = rng.normal(0, 1, (3, 16, 12, 16)).astype(np.float32)
    return jnp.asarray(x), [{k: (jnp.asarray(v) if v is not None else None)
                             for k, v in b.items()} for b in blocks]


def test_pallas_matches_xla_f32(chain):
    x, blocks = chain
    got = bottleneck_chain_pallas(x, blocks, compute_dtype=jnp.float32, interpret=True)
    want = bottleneck_chain_xla(x, blocks, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pallas_matches_xla_bf16(chain):
    x, blocks = chain
    got = bottleneck_chain_pallas(x, blocks, compute_dtype=jnp.bfloat16, interpret=True)
    want = bottleneck_chain_xla(x, blocks, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=1e-5
    )


def test_fold_matches_real_flax_bottleneck():
    """fold_conv_bn + the chain math == the genuine flax Bottleneck eval
    forward (BN with random running stats), block1 with its stage-leading
    downsample projection and a stride-1 follower -- the layer1 shape."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 12, 16)).astype(np.float32))

    b1 = Bottleneck(planes=8, use_downsample=True)
    b2 = Bottleneck(planes=8)
    v1 = b1.init(jax.random.PRNGKey(0), x)
    y_mid_shape = b1.apply(v1, x)
    v2 = b2.init(jax.random.PRNGKey(1), y_mid_shape)

    def _randomize_bn(vs, key):
        params = jax.tree_util.tree_map(np.asarray, vs["params"])
        stats = jax.tree_util.tree_map(np.asarray, vs["batch_stats"])
        r = np.random.default_rng(key)
        for name, st in stats.items():
            st["mean"] = r.normal(0, 0.4, st["mean"].shape).astype(np.float32)
            st["var"] = r.uniform(0.5, 1.5, st["var"].shape).astype(np.float32)
            params[name]["scale"] = r.normal(1.0, 0.2, st["mean"].shape).astype(np.float32)
            params[name]["bias"] = r.normal(0, 0.2, st["mean"].shape).astype(np.float32)
        return {"params": params, "batch_stats": stats}

    v1, v2 = _randomize_bn(v1, 2), _randomize_bn(v2, 3)
    want = b2.apply(v2, b1.apply(v1, x))

    def fold_block(vs, downsample):
        p, s = vs["params"], vs["batch_stats"]

        def fold(conv, bn, squeeze):
            k = p[conv]["kernel"]
            if squeeze:  # 1x1 conv as a matmul
                k = k[0, 0]
            return fold_conv_bn(k, p[bn]["scale"], p[bn]["bias"],
                                s[bn]["mean"], s[bn]["var"])

        blk = {}
        blk["w1"], blk["b1"] = fold("conv1", "bn1", True)
        blk["w2"], blk["b2"] = fold("conv2", "bn2", False)
        blk["w3"], blk["b3"] = fold("conv3", "bn3", True)
        if downsample:
            blk["wd"], blk["bd"] = fold("downsample_conv", "downsample_bn", True)
        else:
            blk["wd"] = None
        return blk

    blocks = [fold_block(v1, True), fold_block(v2, False)]
    got = bottleneck_chain_xla(x, blocks, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
    got_p = bottleneck_chain_pallas(x, blocks, compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(want), atol=2e-4)
