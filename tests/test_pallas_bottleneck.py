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


def _randomize_model_bn(variables, seed):
    """Random running stats + BN affines everywhere so folding is
    non-trivial AND eval activations stay normalized (random-init eval-mode
    BN is an identity, which lets magnitudes blow up through deep nets)."""
    r = np.random.default_rng(seed)

    def rand_stat(path, leaf):
        key = path[-1].key
        if key == "mean":
            return r.normal(0, 0.3, leaf.shape).astype(np.float32)
        if key == "var":
            return r.uniform(1.0, 4.0, leaf.shape).astype(np.float32)
        return np.asarray(leaf)

    stats = jax.tree_util.tree_map_with_path(rand_stat, variables["batch_stats"])
    return {"params": variables["params"], "batch_stats": stats}


def test_fused_layer1_apply_resnet50_se():
    """PoseResNet(resnet50, se=True): full apply with layer1_folded (the
    fused Pallas path, SE gate included -- the flagship's layer1 block 0
    carries SE) == the ordinary flax forward."""
    from simple_pose_tpu.models.resnet import build_resnet
    from simple_pose_tpu.ops.pallas_bottleneck import fold_bottleneck_blocks

    model = build_resnet("resnet50", se=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = _randomize_model_bn(model.init(jax.random.PRNGKey(0), x), 7)
    names = model.layer1_block_names()
    assert names == ["layer1_0", "layer1_1", "layer1_2"]
    folded = fold_bottleneck_blocks(variables["params"], variables["batch_stats"], names)
    assert folded[0].get("sf1") is not None  # SE folded in block 0
    assert folded[1].get("sf1") is None
    want = model.apply(variables, x)
    got = model.apply(variables, x, layer1_folded=folded)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(got - want))) / scale < 1e-4


def test_fused_layer1_apply_hrnet_w32():
    from simple_pose_tpu.models.hrnet import build_hrnet
    from simple_pose_tpu.ops.pallas_bottleneck import fold_bottleneck_blocks

    model = build_hrnet("w32")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    variables = _randomize_model_bn(model.init(jax.random.PRNGKey(0), x), 9)
    names = model.layer1_block_names()
    assert len(names) == 4 and names[0] == "layer1_m0_b0_0"
    folded = fold_bottleneck_blocks(variables["params"], variables["batch_stats"], names)
    want = model.apply(variables, x)
    got = model.apply(variables, x, layer1_folded=folded)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert float(jnp.max(jnp.abs(got - want))) / scale < 1e-4


def test_layer1_block_names_unsupported_trunks():
    from simple_pose_tpu.models.resnet import build_resnet

    assert build_resnet("resnet18").layer1_block_names() is None  # BasicBlock
    assert build_resnet("resnext50_32x4d").layer1_block_names() is None  # grouped


def test_evaluator_fused_layer1():
    """PoseEvaluator(fused_layer1=True) decodes the same keypoints as the
    plain evaluator (identical PRNGKey(0) init weights), and the guards
    reject mesh / non-foldable trunks."""
    import pytest

    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    cfg = {"type": "pose_resnet_dconv", "name": "resnet50", "num_joints": 17}
    rng = np.random.default_rng(0)
    b, canvas = 2, 128
    s = canvas / 64
    batch = {
        "canvas": rng.integers(0, 255, (b, canvas, canvas, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 0], [0, 1 / s, 0]], np.float32), (b, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (b, 1, 1)),
    }
    ev0 = PoseEvaluator(cfg, None, (64, 64), amp=False)
    ev1 = PoseEvaluator(cfg, None, (64, 64), amp=False, fused_layer1=True)
    out0, out1 = ev0(batch), ev1(batch)
    np.testing.assert_allclose(np.asarray(out1["kps"]), np.asarray(out0["kps"]),
                               atol=0.15)  # canvas px
    np.testing.assert_allclose(np.asarray(out1["conf"]), np.asarray(out0["conf"]),
                               atol=1e-3)

    with pytest.raises(ValueError, match="single-device"):
        from simple_pose_tpu.parallel.mesh import make_mesh

        PoseEvaluator(cfg, None, (64, 64), mesh=make_mesh(), fused_layer1=True)
    with pytest.raises(ValueError, match="foldable"):
        PoseEvaluator({"type": "pose_resnet_dconv", "name": "resnet18",
                       "num_joints": 17}, None, (64, 64), fused_layer1=True)
