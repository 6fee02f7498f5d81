"""Utility modules + CLI surface smoke."""

import subprocess
import sys

import numpy as np
import pytest

from simple_pose_tpu.utils.misc import AverageLogger, rand_seed
from simple_pose_tpu.utils.viz import draw_heat_map, draw_pose
from simple_pose_tpu.train.config import load_config


def test_average_logger():
    log = AverageLogger()
    log.update(2.0)
    log.update(4.0)
    assert log.avg() == 3.0 and log.sum() == 6.0
    log.update(10.0, count=2)
    assert log.sum() == 16.0 and log.count == 4
    log.reset()
    assert log.count == 0.0


def test_rand_seed_determinism():
    rand_seed(7)
    a = np.random.rand(3)
    rand_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_draw_pose_and_heatmap():
    pytest.importorskip("cv2")
    img = np.zeros((100, 100, 3), np.uint8)
    joints = np.zeros((17, 3), np.float32)
    joints[:, 0] = np.linspace(10, 90, 17)
    joints[:, 1] = np.linspace(10, 90, 17)
    joints[:, 2] = 1.0
    out = draw_pose(img, joints, box=(5, 5, 95, 95))
    assert out.shape == img.shape and out.sum() > 0
    heat = np.zeros((17, 64, 48), np.float32)
    heat[0, 30, 20] = 1.0
    hm = draw_heat_map(heat, mask=np.ones(17))
    assert hm.shape == (64, 48, 3) and hm.max() == 255


def test_config_loader_roundtrip():
    cfg = load_config("configs/fast_pose.yaml")
    assert cfg.model.type == "pose_resnet_dconv"
    assert cfg.data.batch_size == 128
    assert cfg.optim.milestones == [120, 160]
    assert cfg.data.input_shape == (192, 256)
    assert cfg.mesh == {"data": -1}


@pytest.mark.parametrize("argv", [["main.py", "--help"], ["eval.py", "--help"], ["eval.py", "gt", "--help"]])
def test_cli_help(argv):
    r = subprocess.run([sys.executable] + argv, capture_output=True, text=True, cwd=".")
    assert r.returncode == 0, r.stderr
    assert "usage" in r.stdout.lower()


def test_resolve_amp_dtype_rules(monkeypatch):
    import jax
    import jax.numpy as jnp

    from simple_pose_tpu.models import registry
    from simple_pose_tpu.models.registry import resolve_amp_dtype

    assert resolve_amp_dtype(True) == jnp.bfloat16
    assert resolve_amp_dtype(False) is None
    # pin BOTH 'auto' outcomes by forcing the backend answer, so a
    # regression in the auto rule can't hide behind the test environment
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_amp_dtype("auto") == jnp.bfloat16
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve_amp_dtype("auto") is None
