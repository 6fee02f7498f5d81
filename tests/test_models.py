"""Model family construction + output shapes + registry."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_pose_tpu.models import build_model
from simple_pose_tpu.models.resnet import RESNET_SPECS


@pytest.mark.parametrize("mtype,name,kwargs", [
    ("pose_resnet_dconv", "resnet18", {"reduction": True}),
    ("pose_resnet_duc", "resnet18", {"reduction": False}),
    ("pose_hrnet", "w32", {}),
    ("pose_hrnet", "w48", {}),
])
def test_forward_shape(mtype, name, kwargs):
    m = build_model(mtype, name, num_joints=17, **kwargs)
    x = jnp.zeros((1, 256, 192, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (1, 64, 48, 17)
    assert np.all(np.isfinite(np.asarray(y)))


def test_train_mode_mutates_batch_stats():
    m = build_model("pose_resnet_dconv", "resnet18", train=True)
    x = jnp.ones((2, 64, 48, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y, updates = m.apply(variables, x, mutable=["batch_stats"])
    assert "batch_stats" in updates
    # running stats must move away from init zeros
    leaf = jax.tree.leaves(updates["batch_stats"])[0]
    assert np.any(np.asarray(leaf) != 0.0)


def test_registry_rejects_unknown():
    with pytest.raises(KeyError):
        build_model("pose_transformer")


def test_all_resnet_specs_buildable():
    # construction only (no init) for every factory name
    for name in RESNET_SPECS:
        build_model("pose_resnet_dconv", name)
        build_model("pose_resnet_duc", name)


def test_se_param_structure():
    m = build_model("pose_resnet_dconv", "resnet50", reduction=True)
    x = jnp.zeros((1, 64, 48, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    # reference quirk: SE only in stage-leading blocks with a downsample
    assert "se" in p["layer1_0"]
    assert "se" not in p["layer1_1"]
    assert "se" in p["layer2_0"]
