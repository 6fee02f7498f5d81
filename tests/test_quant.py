"""W8A8 quantized conv path (models/quant.py): interceptor math pinned
against the explicit quantization formula, model-level fidelity on a full
pose net, evaluator integration, and serving export of the quantized
program."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_pose_tpu.models.quant import quantized


def _ref_w8a8(x, w, b=None, stride=1, pad=1, groups=1):
    """The documented formula, written independently of the interceptor."""
    s_w = np.maximum(np.abs(w).max(axis=(0, 1, 2)) / 127.0, 1e-8)
    w8 = np.round(w / s_w).astype(np.int8)
    s_x = max(np.abs(x).max() / 127.0, 1e-8)
    x8 = np.clip(np.round(x / s_x), -127, 127).astype(np.int8)
    y = jax.lax.conv_general_dilated(
        x8, w8, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=jnp.int32)
    out = np.asarray(y, np.float32) * (s_x * s_w)
    return out + b if b is not None else out


@pytest.mark.parametrize("stride,bias,groups", [(1, False, 1), (2, True, 1), (1, False, 2)])
def test_w8a8_conv_matches_formula(stride, bias, groups):
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (2, 8, 8, 4)).astype(np.float32)
    conv = nn.Conv(6, (3, 3), strides=(stride, stride),
                   padding=[(1, 1), (1, 1)], use_bias=bias,
                   feature_group_count=groups)
    v = conv.init(jax.random.PRNGKey(1), jnp.asarray(x))
    with quantized("w8a8"):
        got = conv.apply(v, jnp.asarray(x))
    w = np.asarray(v["params"]["kernel"])
    b = np.asarray(v["params"]["bias"]) if bias else None
    want = _ref_w8a8(x, w, b, stride=stride, groups=groups)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_w8a8_model_fidelity():
    """Full pose net: the int8 path must track the float path closely even
    through ~20 chained quantized convs."""
    from simple_pose_tpu.models import build_model

    m = build_model("pose_resnet_dconv", "resnet18", num_joints=17,
                    train=False, reduction=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(-0.5, 0.5, (4, 64, 64, 3)).astype(np.float32))
    yf = np.asarray(m.apply(v, x))
    with quantized("w8a8"):
        yq = np.asarray(jax.jit(m.apply)(v, x))
    cos = (yf * yq).sum() / (np.linalg.norm(yf) * np.linalg.norm(yq))
    assert cos > 0.99, cos
    assert np.abs(yq - yf).max() < 0.1 * np.abs(yf).max()


def test_quantized_rejects_unknown_mode():
    with pytest.raises(ValueError, match="w8a8"):
        quantized("int4")
    # None is the pass-through used by config plumbing
    with quantized(None):
        pass


def test_evaluator_quant_end_to_end():
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    cfg = {"type": "pose_resnet_dconv", "name": "resnet18",
           "num_joints": 17, "reduction": True}
    with pytest.raises(ValueError, match="quant"):
        PoseEvaluator(cfg, None, input_shape=(64, 64), quant="bogus")

    ev = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None, quant="w8a8")
    rng = np.random.default_rng(0)
    s = 96 / 64.0
    batch = {
        "canvas": rng.integers(0, 255, (4, 96, 96, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (4, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (4, 1, 1)),
    }
    out = ev(batch)
    assert set(out) == {"kps", "conf", "scores"}
    assert out["kps"].shape == (4, 17, 2)
    assert np.isfinite(np.asarray(out["kps"])).all()


def test_quant_export_roundtrip():
    """The quantized program survives jax.export serialization."""
    from simple_pose_tpu.evalkit.export import export_evaluator, load_exported
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    cfg = {"type": "pose_resnet_dconv", "name": "resnet18",
           "num_joints": 17, "reduction": True}
    ev = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None, quant="w8a8")
    rng = np.random.default_rng(1)
    s = 96 / 64.0
    batch = {
        "canvas": rng.integers(0, 255, (4, 96, 96, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (4, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (4, 1, 1)),
    }
    live = ev(batch)
    exported = export_evaluator(ev, 4, (96, 96))
    out = load_exported(exported.serialize()).call(
        batch["canvas"], batch["trans"], batch["trans_inv"])
    np.testing.assert_allclose(np.asarray(out["kps"]), np.asarray(live["kps"]),
                               atol=0.2)


def test_detector_quant_smoke():
    """quant='w8a8' through the YOLOv5 wrapper: runs, finite, boxes clipped."""
    from simple_pose_tpu.detector.wrapper import YOLOv5Detector

    with pytest.raises(ValueError, match="quant"):
        YOLOv5Detector(weights_path=None, scale_name="s", quant="int4")

    det = YOLOv5Detector(weights_path=None, scale_name="s", scale_size=(256, 256),
                         conf_thresh=0.01, canvas=512, quant="w8a8")
    img = np.random.default_rng(4).integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    boxes = det.single_predict(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 6
    assert np.isfinite(boxes).all()
    if len(boxes):
        assert boxes[:, 0].min() >= -1e-3 and boxes[:, 2].max() <= 400 + 1e-3


def test_fused_quant_smoke():
    """quant='w8a8' through the single fused detect->pose program."""
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    fused = FusedDetectPose(
        {"type": "pose_resnet_dconv", "name": "resnet18", "num_joints": 17},
        detector_weights=None, scale_name="s", det_size=(256, 256),
        input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=256,
        quant="w8a8",
    )
    canvases = np.random.default_rng(3).integers(
        0, 255, size=(1, 256, 256, 3), dtype=np.uint8)
    out = fused(canvases, [(200, 256)])
    assert out["kps"].shape == (1, 4, 17, 2)
    assert np.all(np.isfinite(out["kps"]))


def test_w8a8_hrnet_topology_fidelity():
    """Multi-branch HRNet topology (strided transitions, fuse 1x1s, final
    1x1 head) through the quantized path on a tiny config."""
    from simple_pose_tpu.models.hrnet import PoseHRNet

    cfg = {
        "FINAL_CONV_KERNEL": 1,
        "LAYER1_NUM_BLOCKS": 2,
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [2, 2], "NUM_CHANNELS": [4, 8], "FUSE_METHOD": "SUM"},
        "STAGE4": {"NUM_MODULES": 2, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [2, 2, 2], "NUM_CHANNELS": [4, 8, 16], "FUSE_METHOD": "SUM"},
    }
    m = PoseHRNet(cfg=cfg, num_joints=3)
    x = jnp.asarray(np.random.default_rng(5)
                    .uniform(-0.5, 0.5, (2, 64, 48, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    yf = np.asarray(m.apply(v, x))
    with quantized("w8a8"):
        yq = np.asarray(jax.jit(m.apply)(v, x))
    assert yq.shape == yf.shape
    cos = (yf * yq).sum() / (np.linalg.norm(yf) * np.linalg.norm(yq))
    assert cos > 0.99, cos


def test_calibrated_static_scales_match_dynamic():
    """calibrate_w8a8 scales equal the calibration batch's dynamic maxes, so
    the static-scale program reproduces the dynamic one on that batch; on a
    hotter batch the static path saturates (clips) instead of rescaling."""
    from simple_pose_tpu.models import build_model
    from simple_pose_tpu.models.quant import calibrate_w8a8

    m = build_model("pose_resnet_dconv", "resnet18", num_joints=17,
                    train=False, reduction=True)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    x = jnp.asarray(np.random.default_rng(3)
                    .uniform(-0.5, 0.5, (2, 64, 64, 3)).astype(np.float32))

    scales = calibrate_w8a8(lambda a: m.apply(v, a), [x])
    assert len(scales) > 15 and all(s > 0 for s in scales.values())

    with quantized("w8a8"):
        dyn = np.asarray(jax.jit(m.apply)(v, x))
    with quantized("w8a8", scales):
        stat = np.asarray(jax.jit(m.apply)(v, x))
    np.testing.assert_allclose(stat, dyn, rtol=1e-5, atol=1e-7)

    # a scale missing from the dict falls back to dynamic (partial calib)
    some = dict(list(scales.items())[:3])
    with quantized("w8a8", some):
        part = np.asarray(jax.jit(m.apply)(v, x))
    np.testing.assert_allclose(part, dyn, rtol=1e-5, atol=1e-7)


def test_evaluator_quant_static_scales():
    from simple_pose_tpu.models.quant import calibrate_w8a8
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    cfg = {"type": "pose_resnet_dconv", "name": "resnet18",
           "num_joints": 17, "reduction": True}
    ev_dyn = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None,
                           quant="w8a8")
    x = jnp.asarray(np.random.default_rng(4)
                    .uniform(-0.5, 0.5, (4, 64, 64, 3)).astype(np.float32))
    scales = calibrate_w8a8(lambda a: ev_dyn.model.apply(ev_dyn.variables, a), [x])
    ev_stat = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None,
                            quant="w8a8", quant_scales=scales)
    rng = np.random.default_rng(0)
    s = 96 / 64.0
    batch = {
        "canvas": rng.integers(0, 255, (4, 96, 96, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (4, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (4, 1, 1)),
    }
    out = ev_stat(batch)
    assert np.isfinite(np.asarray(out["kps"])).all()


def test_evaluator_calibrate_rebuilds_static_step(tmp_path):
    """PoseEvaluator.calibrate on an eval batch: the rebuilt static-scale
    program tracks the dynamic one on the calibration batch (its scales ARE
    that batch's maxes), and the scales persist through save/load."""
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator
    from simple_pose_tpu.models.quant import load_scales, save_scales

    cfg = {"type": "pose_resnet_dconv", "name": "resnet18",
           "num_joints": 17, "reduction": True}
    rng = np.random.default_rng(7)
    s = 96 / 64.0
    batch = {
        "canvas": rng.integers(0, 255, (4, 96, 96, 3), dtype=np.uint8),
        "trans": np.tile(np.array([[1 / s, 0, 2], [0, 1 / s, 2]], np.float32), (4, 1, 1)),
        "trans_inv": np.tile(np.array([[4 * s, 0, 0], [0, 4 * s, 0]], np.float32), (4, 1, 1)),
    }

    ev = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None, quant="w8a8")
    scales = ev.calibrate(iter([batch]), num_batches=1)
    assert scales is ev.quant_scales and len(scales) > 15
    assert all(v > 0 for v in scales.values())
    stat = ev(batch)
    assert np.isfinite(np.asarray(stat["kps"])).all()

    # heatmap-level fidelity: calibration records FLOAT-forward maxes, so the
    # static program is close to (not bit-equal with) the dynamic one; with
    # random weights the decoded argmax is chaotic, the heatmaps are not
    from simple_pose_tpu.data.pipeline import RGB_MEAN
    from simple_pose_tpu.models.quant import quantized

    x = ev._crop_fn(jnp.asarray(batch["canvas"]),
                    jnp.asarray(batch["trans"])) / 255.0 - RGB_MEAN
    with quantized("w8a8"):
        hd = np.asarray(ev.model.apply(ev.variables, x), np.float32)
    with quantized("w8a8", scales):
        hs = np.asarray(ev.model.apply(ev.variables, x), np.float32)
    cos = (hd * hs).sum() / (np.linalg.norm(hd) * np.linalg.norm(hs))
    assert cos > 0.99, cos

    # the rebuilt step IS the constructor's static-scale program
    path = str(tmp_path / "scales.json")
    save_scales(scales, path)
    loaded = load_scales(path)
    assert loaded == {k: float(v) for k, v in scales.items()}
    ev2 = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None,
                        quant="w8a8", quant_scales=loaded)
    np.testing.assert_allclose(np.asarray(ev2(batch)["kps"]),
                               np.asarray(stat["kps"]), atol=1e-5)


def test_calibrate_requires_quant_mode():
    from simple_pose_tpu.evalkit.workflows import PoseEvaluator

    cfg = {"type": "pose_resnet_dconv", "name": "resnet18",
           "num_joints": 17, "reduction": True}
    ev = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None)
    with pytest.raises(ValueError, match="quant"):
        ev.calibrate(iter([]), 1)
    ev_q = PoseEvaluator(cfg, None, input_shape=(64, 64), amp=None, quant="w8a8")
    with pytest.raises(ValueError, match="empty"):
        ev_q.calibrate(iter([]), 1)


def test_detector_calibrate_static_scales(tmp_path):
    """YOLOv5Detector.calibrate records per-conv static scales on detection
    batches and rebuilds fully static forwards; a fresh detector constructed
    with the persisted scales reproduces the calibrated boxes exactly."""
    from simple_pose_tpu.detector.wrapper import YOLOv5Detector
    from simple_pose_tpu.models.quant import load_scales, save_scales

    rng = np.random.default_rng(11)
    cfg = dict(weights_path=None, scale_name="s", scale_size=(256, 256),
               conf_thresh=0.01, canvas=512, quant="w8a8")
    det = YOLOv5Detector(**cfg)
    with pytest.raises(ValueError, match="empty"):
        det.calibrate(iter([]), 1)
    canvases = rng.integers(0, 255, (2, 512, 512, 3), dtype=np.uint8)
    shapes = [(300, 400), (512, 512)]
    scales = det.calibrate(iter([(canvases, shapes)]), 1)
    assert scales is det.quant_scales and len(scales) > 20
    assert all(v > 0 for v in scales.values())
    boxes = det.predict_batch(canvases, shapes)
    assert all(np.isfinite(b).all() for b in boxes)

    path = str(tmp_path / "det_scales.json")
    save_scales(scales, path)
    det_stat = YOLOv5Detector(**cfg, quant_scales=load_scales(path))
    for b1, b2 in zip(boxes, det_stat.predict_batch(canvases, shapes)):
        np.testing.assert_allclose(b1, b2, atol=1e-4)

    det_float = YOLOv5Detector(weights_path=None, scale_name="s",
                               scale_size=(256, 256), conf_thresh=0.01, canvas=512)
    with pytest.raises(ValueError, match="quant"):
        det_float.calibrate(iter([(canvases, shapes)]), 1)


def test_fused_calibrate_static_scales():
    """FusedDetectPose.calibrate runs the fused body eagerly, recording
    per-net scale dicts (so module paths can't collide), and the rebuilt
    static program matches a constructor built from the same scales."""
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    cfg = dict(
        pose_model_cfg={"type": "pose_resnet_dconv", "name": "resnet18",
                        "num_joints": 17},
        detector_weights=None, scale_name="s", det_size=(256, 256),
        input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=256,
        quant="w8a8",
    )
    fused = FusedDetectPose(**cfg)
    canvases = np.random.default_rng(13).integers(
        0, 255, size=(1, 256, 256, 3), dtype=np.uint8)
    shapes = [(200, 256)]
    scales = fused.calibrate(iter([(canvases, shapes)]), 1)
    assert set(scales) == {"detector", "pose"}
    assert len(scales["detector"]) > 20 and len(scales["pose"]) > 15
    out = fused(canvases, shapes)
    assert np.isfinite(out["kps"]).all()

    fused_stat = FusedDetectPose(**cfg, quant_scales=scales)
    out2 = fused_stat(canvases, shapes)
    np.testing.assert_allclose(out2["kps"], out["kps"], atol=1e-4)
    np.testing.assert_allclose(out2["det_scores"], out["det_scores"], atol=1e-5)
