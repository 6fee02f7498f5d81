"""AOT serving export (evalkit/export.py): the serialized StableHLO program
must reproduce the live PoseEvaluator -- bit-for-bit with external weights;
to constant-folding tolerance (~2e-4 relative) with baked weights, where XLA
pre-folds the parameter constants differently than the runtime program --
through a file round-trip, and refuse the mesh-sharded evaluator it cannot
represent."""

import numpy as np
import pytest

from simple_pose_tpu.evalkit.export import (
    export_evaluator,
    load_exported,
    save_exported,
    serving_fn,
)
from simple_pose_tpu.evalkit.workflows import PoseEvaluator

MODEL_CFG = {"type": "pose_resnet_dconv", "name": "resnet18",
             "num_joints": 17, "reduction": True}
BATCH, CANVAS = 4, 96


def _make_batch(rng):
    s = CANVAS / 64.0
    return {
        "canvas": rng.integers(0, 255, (BATCH, CANVAS, CANVAS, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32),
                         (BATCH, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32),
                             (BATCH, 1, 1)),
    }


@pytest.fixture(scope="module")
def evaluator():
    return PoseEvaluator(MODEL_CFG, None, input_shape=(64, 64), amp=None)


def test_export_matches_live_evaluator(evaluator, tmp_path):
    batch = _make_batch(np.random.default_rng(0))
    live = evaluator(batch)

    exported = export_evaluator(evaluator, BATCH, (CANVAS, CANVAS))
    n = save_exported(exported, tmp_path / "pose.stablehlo")
    assert n > 0

    call = serving_fn(tmp_path / "pose.stablehlo")
    out = call(batch["canvas"], batch["trans"], batch["trans_inv"])
    assert set(out) == {"kps", "conf", "scores"}
    # baked weights are constant-folded by XLA (different op order than the
    # runtime program): allow folding-level drift, tiny vs the 4px decode grid
    np.testing.assert_allclose(np.asarray(out["kps"]), np.asarray(live["kps"]),
                               atol=0.2)
    np.testing.assert_allclose(np.asarray(out["conf"]), np.asarray(live["conf"]),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["scores"]),
                               np.asarray(live["scores"]), atol=1e-3)


def test_export_external_weights(evaluator):
    batch = _make_batch(np.random.default_rng(1))
    live = evaluator(batch)

    exported = export_evaluator(evaluator, BATCH, (CANVAS, CANVAS),
                                bake_weights=False)
    call = serving_fn(exported.serialize())
    out = call(evaluator.variables, batch["canvas"], batch["trans"],
               batch["trans_inv"])
    np.testing.assert_array_equal(np.asarray(out["kps"]),
                                  np.asarray(live["kps"]))


def test_export_dark_original_returns_heatmaps(evaluator):
    ev = PoseEvaluator(MODEL_CFG, None, input_shape=(64, 64), amp=None,
                       decoder="dark_original")
    # reuse the already-initialized weights so outputs are comparable
    ev.variables = evaluator.variables
    exported = export_evaluator(ev, BATCH, (CANVAS, CANVAS))
    batch = _make_batch(np.random.default_rng(2))
    out = load_exported(exported.serialize()).call(
        batch["canvas"], batch["trans"], batch["trans_inv"])
    assert set(out) == {"heat"}
    assert out["heat"].shape == (BATCH, 17, 16, 16)

    from simple_pose_tpu.ops.decode import decode_dark_original

    kps, conf = decode_dark_original(np.asarray(out["heat"]), batch["trans_inv"])
    live = ev(batch)
    np.testing.assert_allclose(kps, np.asarray(live["kps"]), atol=0.2)
    np.testing.assert_allclose(conf, np.asarray(live["conf"]), atol=1e-3)


def test_export_polymorphic_batch(evaluator):
    """A symbolic-batch artifact serves several batch sizes from one file,
    matching the per-size live evaluator (external weights: bit-exact)."""
    exported = export_evaluator(evaluator, "b", (CANVAS, CANVAS),
                                bake_weights=False)
    call = serving_fn(exported.serialize())
    for size, seed in ((1, 4), (BATCH, 5), (7, 6)):
        full = _make_batch(np.random.default_rng(seed))
        batch = {k: np.resize(v, (size,) + v.shape[1:]) for k, v in full.items()}
        out = call(evaluator.variables, batch["canvas"], batch["trans"],
                   batch["trans_inv"])
        live = evaluator._step(evaluator.variables, evaluator._layer1_folded, batch)
        assert out["kps"].shape == (size, 17, 2)
        np.testing.assert_array_equal(np.asarray(out["kps"]),
                                      np.asarray(live["kps"]))
        np.testing.assert_array_equal(np.asarray(out["scores"]),
                                      np.asarray(live["scores"]))


def test_export_refuses_mesh_evaluator():
    from simple_pose_tpu.parallel.mesh import make_mesh

    ev = PoseEvaluator(MODEL_CFG, None, input_shape=(64, 64), amp=None,
                       mesh=make_mesh({"data": 2}))
    with pytest.raises(ValueError, match="mesh"):
        export_evaluator(ev, BATCH, (CANVAS, CANVAS))


def test_export_cross_platform_lowering(evaluator):
    """One artifact lowered for both TPU and CPU still runs on CPU."""
    exported = export_evaluator(evaluator, BATCH, (CANVAS, CANVAS),
                                platforms=("tpu", "cpu"))
    assert set(p.lower() for p in exported.platforms) == {"tpu", "cpu"}
    batch = _make_batch(np.random.default_rng(3))
    out = load_exported(exported.serialize()).call(
        batch["canvas"], batch["trans"], batch["trans_inv"])
    live = evaluator(batch)
    np.testing.assert_allclose(np.asarray(out["kps"]), np.asarray(live["kps"]),
                               atol=0.2)


def test_export_fused_program():
    """Fused detect->pose exports and reproduces the live program."""
    from simple_pose_tpu.evalkit.export import export_fused, load_exported
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    fused = FusedDetectPose(
        {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
        detector_weights=None, scale_name="s", det_size=(256, 256),
        input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=256,
    )
    rng = np.random.default_rng(7)
    canvases = rng.integers(0, 255, size=(2, 256, 256, 3), dtype=np.uint8)
    shapes = [(200, 256), (256, 256)]
    live = fused(canvases, shapes)

    exported = export_fused(fused, 2, 256)
    lb = fused.host_prep(shapes)
    out = load_exported(exported.serialize()).call(canvases, *lb)
    assert set(out) == set(live)
    # untrained nets: constant folding (baked weights) amplifies through
    # NMS + Newton decode on noise heatmaps -- coarse closeness only
    np.testing.assert_allclose(np.asarray(out["kps"]), np.asarray(live["kps"]),
                               rtol=1e-3, atol=2.0)
    np.testing.assert_array_equal(np.asarray(out["det_valid"]),
                                  np.asarray(live["det_valid"]))
