"""SPMD solver: train steps on the virtual 8-device mesh, val AP, resume."""

import numpy as np
import pytest

cv = pytest.importorskip("cv2")

import jax

from simple_pose_tpu.train.config import load_config
from simple_pose_tpu.train.solver import PoseSolver
from simple_pose_tpu.parallel.mesh import make_mesh
from tests.util_synth import make_synth_coco


def _cfg(img_root, ann_path, tmp, **optim):
    return load_config({
        "model_name": "test",
        "data": {
            "train_ann_path": ann_path, "val_ann_path": ann_path,
            "train_img_root": img_root, "val_img_root": img_root,
            "batch_size": 8, "num_workers": 2, "canvas": 192,
            "input_shape": [64, 64],
        },
        "model": {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
        "optim": {"lr": 1e-3, "milestones": [2], "epochs": 3, "gamma": 0.1, **optim},
        "val": {"interval": 1, "weight_path": str(tmp / "weights")},
        "mesh": {"data": 8},
        "seed": 11,
    })


@pytest.fixture(scope="module")
def solver_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_root, ann_path, _ = make_synth_coco(str(root), num_images=16)
    return img_root, ann_path, root


def test_train_steps_on_8_device_mesh(solver_env):
    img_root, ann_path, root = solver_env
    solver = PoseSolver(_cfg(img_root, ann_path, root))
    assert solver.mesh.devices.size == 8
    solver.init_state()
    m1 = solver.train_epoch(0, log_every=0)
    assert np.isfinite(m1["loss"]) and m1["loss"] > 0
    assert int(solver.state.step) == solver.train_pipe.batches_per_epoch()
    # EMA must have moved off the init params
    p = jax.tree.leaves(solver.state.params)[0]
    e = jax.tree.leaves(solver.state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))
    m2 = solver.train_epoch(1, log_every=0)
    assert np.isfinite(m2["loss"])


def test_validate_produces_ap(solver_env, tmp_path):
    img_root, ann_path, root = solver_env
    solver = PoseSolver(_cfg(img_root, ann_path, root))
    solver.init_state()
    stats = solver.validate(0, results_path=str(tmp_path / "res.json"))
    assert "AP" in stats and 0.0 <= stats["AP"] <= 1.0 or stats["AP"] == -1.0


def test_checkpoint_roundtrip(solver_env):
    img_root, ann_path, root = solver_env
    solver = PoseSolver(_cfg(img_root, ann_path, root))
    solver.init_state()
    solver.train_epoch(0, log_every=0)
    solver.save_checkpoint(epoch=0, val_ap=0.5)
    step_before = int(solver.state.step)
    params_before = np.asarray(jax.tree.leaves(solver.state.params)[0])

    solver2 = PoseSolver(_cfg(img_root, ann_path, root))
    solver2.init_state()
    start = solver2.restore_checkpoint()
    assert start == 1
    assert int(solver2.state.step) == step_before
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(solver2.state.params)[0]), params_before)
    assert solver2.best_ap == 0.5


def test_amp_bf16_step(solver_env):
    img_root, ann_path, root = solver_env
    solver = PoseSolver(_cfg(img_root, ann_path, root, amp=True))
    solver.init_state()
    m = solver.train_epoch(0, log_every=0)
    assert np.isfinite(m["loss"])
    # params stay f32 master copies
    assert jax.tree.leaves(solver.state.params)[0].dtype == np.float32


def test_sgd_weight_decay_and_warmup_schedule(solver_env):
    img_root, ann_path, root = solver_env
    cfg = _cfg(img_root, ann_path, root,
               optimizer="sgd", momentum=0.9, weight_decay=1e-4,
               schedule="warmup_cosine_multistep", warm_up_epoch=1)
    solver = PoseSolver(cfg)
    solver.init_state()
    m = solver.train_epoch(0, log_every=0)
    assert np.isfinite(m["loss"])


def test_biased_encoding_and_decoder_override(solver_env):
    """data.encoding: biased (BasicSimpleTransform path) + val.decoder
    override train/validate end to end."""
    img_root, ann_path, root = solver_env
    cfg = _cfg(img_root, ann_path, root)
    cfg.data.encoding = "biased"
    cfg.val.decoder = "gauss_taylor"
    solver = PoseSolver(cfg)
    solver.init_state()
    m = solver.train_epoch(0, log_every=0)
    assert np.isfinite(m["loss"]) and m["loss"] > 0
    stats = solver.validate(0, results_path=str(root / "res_biased.json"))
    assert "AP" in stats


def test_split_groups_optimizer(solver_env):
    """3-group multi_transform optimizer (split_optimizer parity) with the
    bias warmup ramp trains and produces distinct group treatment."""
    img_root, ann_path, root = solver_env
    cfg = _cfg(img_root, ann_path, root,
               split_groups=True, weight_decay=1e-4,
               schedule="warmup_cosine_multistep", warm_up_epoch=1)
    solver = PoseSolver(cfg)
    solver.init_state()
    m = solver.train_epoch(0, log_every=0)
    assert np.isfinite(m["loss"])


def test_gather_crop_impl_matches_reference_path(solver_env):
    """The exact-parity gather crop stays wired through the solver."""
    from simple_pose_tpu.train.solver import make_train_step
    import optax
    from simple_pose_tpu.train.schedules import multistep_schedule
    from simple_pose_tpu.models import build_model
    import jax.numpy as jnp
    from simple_pose_tpu.train.solver import TrainState

    model = build_model("pose_resnet_dconv", "resnet18", train=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32))
    tx = optax.adam(multistep_schedule(1e-3, [10], 0.1, 10))
    state = TrainState(
        params=variables["params"], batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        ema_params=variables["params"], ema_batch_stats=variables["batch_stats"],
        step=jnp.zeros((), jnp.int32),
    )
    rng = np.random.default_rng(0)
    batch = {
        "canvas": rng.integers(0, 255, (8, 96, 96, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[0.6, 0.1, 4], [-0.1, 0.6, 4]], np.float32), (8, 1, 1)),
        "joints": np.concatenate(
            [rng.uniform(2, 14, (8, 17, 2)).astype(np.float32), np.ones((8, 17, 1), np.float32)], -1),
        "trans_inv": np.tile(np.array([[2.0, 0, 0], [0, 2.0, 0]], np.float32), (8, 1, 1)),
    }
    step = jax.jit(make_train_step(model, tx, (16, 16), (64, 64), crop_impl="gather"))
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_run_loop_with_resume(solver_env, tmp_path):
    """Full run(): 2 epochs with val + ckpt, then resume skips done epochs."""
    img_root, ann_path, root = solver_env
    cfg = _cfg(img_root, ann_path, root)
    cfg.optim.epochs = 1
    cfg.val.weight_path = str(tmp_path / "w")
    solver = PoseSolver(cfg)
    solver.run()
    assert int(solver.state.step) == solver.train_pipe.batches_per_epoch()

    solver2 = PoseSolver(cfg)
    solver2.init_state()
    start = solver2.restore_checkpoint()
    assert start == 1  # epoch 0 done; resume would start at 1 (== epochs, so no-op)


def test_two_axis_mesh(solver_env):
    """The reserved 'model' mesh axis composes with data parallelism
    (SURVEY.md section 2 parallelism plan): params replicated, batch sharded
    over 'data' only."""
    img_root, ann_path, root = solver_env
    cfg = _cfg(img_root, ann_path, root)
    cfg.mesh = {"data": 4, "model": 2}
    solver = PoseSolver(cfg)
    assert solver.mesh.shape == {"data": 4, "model": 2}
    solver.init_state()
    m = solver.train_epoch(0, log_every=0)
    assert np.isfinite(m["loss"])


def test_split_groups_bias_warmup_first_step(solver_env):
    """At global step 0 of the warmup, the kernel/scale groups have lr 0
    (ramp from 0) while the bias group has lr 0.1 (ramp from 0.1,
    optims_utils.py:68-72) -- so one SGD step moves ONLY biases."""
    img_root, ann_path, root = solver_env
    cfg = _cfg(img_root, ann_path, root,
               optimizer="sgd", momentum=0.0, split_groups=True,
               schedule="warmup_cosine_multistep", warm_up_epoch=1)
    solver = PoseSolver(cfg)
    solver.init_state()
    before = jax.tree.map(np.asarray, solver.state.params)
    batch = next(iter(solver.train_pipe.epoch(0)))
    solver._compile()
    from simple_pose_tpu.parallel.mesh import shard_batch
    solver.state, _ = solver._train_step(solver.state, shard_batch(batch, solver.mesh))
    after = jax.tree.map(np.asarray, solver.state.params)

    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    bias_moved = 0
    for (path_b, b), (_, a) in zip(flat_b, flat_a):
        leaf = path_b[-1].key
        if leaf in ("kernel", "scale"):
            np.testing.assert_array_equal(a, b, err_msg=f"{path_b} moved at lr 0")
        elif leaf == "bias":
            bias_moved += int(not np.array_equal(a, b))
    assert bias_moved > 0, "no bias moved despite the 0.1 warmup start"
