"""Detector: block parity vs torch oracles, NMS oracle, slicing, e2e smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
from torch import nn as tnn

from simple_pose_tpu.convert.torch2flax import convert_torch_state_generic, merge_converted
from simple_pose_tpu.detector.blocks import CBR, BottleNeckCSP, Focus, SPP, hardswish, mish
from simple_pose_tpu.detector.nms import box_iou, non_max_suppression_jit, xywh2xyxy
from simple_pose_tpu.detector.wrapper import YOLOv5Detector, letterbox_params, slice_person_head
from simple_pose_tpu.detector.yolov5 import YOLOv5


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def _to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ----------------------------------------------------------- torch oracles
class TCBR(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        p = (k - 1) // 2
        self.conv = tnn.Conv2d(cin, cout, k, s, p, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return tnn.functional.hardswish(self.bn(self.conv(x)))


class TBottleNeck(tnn.Module):
    def __init__(self, c, shortcut=True):
        super().__init__()
        self.conv1 = TCBR(c, c, 1)
        self.conv2 = TCBR(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        return x + out if self.add else out


class TBottleNeckCSP(tnn.Module):
    def __init__(self, cin, cout, blocks=2, shortcut=True):
        super().__init__()
        inner = cout // 2
        self.conv1_0 = TCBR(cin, inner, 1)
        self.conv2_0 = tnn.Conv2d(cin, inner, 1, bias=False)
        self.conv1_n = tnn.Conv2d(inner, inner, 1, bias=False)
        self.conv3 = TCBR(2 * inner, cout, 1)
        self.bn = tnn.BatchNorm2d(2 * inner)
        self.conv1_s = tnn.Sequential(*[TBottleNeck(inner, shortcut) for _ in range(blocks)])

    def forward(self, x):
        y1 = self.conv1_n(self.conv1_s(self.conv1_0(x)))
        y2 = self.conv2_0(x)
        y = tnn.functional.hardswish(self.bn(torch.cat([y1, y2], dim=1)))
        return self.conv3(y)


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.normal_(1.0, 0.1)
            m.bias.data.normal_(0, 0.1)


def test_cbr_and_csp_parity_via_generic_converter():
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    t = TBottleNeckCSP(8, 16, blocks=2)
    _randomize_bn(t)
    t.eval()
    f = BottleNeckCSP(16, blocks=2, shortcut=True)
    x = rng.normal(size=(2, 8, 8, 8)).astype(np.float32)
    converted, skipped = convert_torch_state_generic(t.state_dict())
    variables = f.init(jax.random.PRNGKey(0), jnp.asarray(x))
    merged, missing, unexpected = merge_converted(variables, converted)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    got = np.asarray(f.apply(merged, jnp.asarray(x)))
    with torch.no_grad():
        ref = _to_nhwc(t(_nchw(x)))
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_focus_phase_order_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    xt = _nchw(x)
    ref = torch.cat(
        [xt[..., ::2, ::2], xt[..., 1::2, ::2], xt[..., ::2, 1::2], xt[..., 1::2, 1::2]], dim=1
    )
    got = jnp.concatenate(
        [jnp.asarray(x)[:, ::2, ::2, :], jnp.asarray(x)[:, 1::2, ::2, :],
         jnp.asarray(x)[:, ::2, 1::2, :], jnp.asarray(x)[:, 1::2, 1::2, :]], axis=-1
    )
    np.testing.assert_allclose(np.asarray(got), _to_nhwc(ref), atol=0)


def test_mish_matches_torch():
    x = np.linspace(-5, 5, 101).astype(np.float32)
    ref = torch.nn.functional.mish(torch.from_numpy(x)).numpy()
    got = np.asarray(mish(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_yolov5_shapes_and_modes():
    m = YOLOv5(num_cls=80, scale_name="s")
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    n = (32**2 + 16**2 + 8**2) * 3
    assert out.shape == (1, n, 85)
    mt = YOLOv5(num_cls=80, scale_name="s", train=True)
    raw, anchors = mt.apply(variables, x, mutable=["batch_stats"])[0]
    assert len(raw) == 3 and raw[0].shape == (1, 3, 32, 32, 85)
    assert anchors.shape == (3, 3, 2)


# ------------------------------------------------------------------- NMS
def _oracle_nms(boxes, scores, iou_thresh):
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        iou = np.asarray(box_iou(jnp.asarray(boxes[i][None]), jnp.asarray(boxes[rest])))[0]
        order = rest[iou <= iou_thresh]
    return keep


def test_nms_matches_greedy_oracle():
    rng = np.random.default_rng(2)
    n = 40
    cx = rng.uniform(50, 200, n)
    cy = rng.uniform(50, 200, n)
    wh = rng.uniform(20, 60, (n, 2))
    obj = rng.uniform(0.2, 1.0, n)
    pred = np.zeros((1, n, 6), np.float32)  # single class
    pred[0, :, 0] = cx
    pred[0, :, 1] = cy
    pred[0, :, 2:4] = wh
    pred[0, :, 4] = obj
    pred[0, :, 5] = 1.0  # class prob
    dets, valid = non_max_suppression_jit(jnp.asarray(pred), conf_thresh=0.1, iou_thresh=0.5,
                                          max_det=50, pre_nms=64)
    got = np.asarray(dets[0])[np.asarray(valid[0])]
    boxes = np.asarray(xywh2xyxy(jnp.asarray(pred[0, :, :4])))
    keep = _oracle_nms(boxes, obj, 0.5)
    ref_scores = sorted(obj[keep], reverse=True)
    np.testing.assert_allclose(sorted(got[:, 4], reverse=True), ref_scores, rtol=1e-5)


def test_nms_class_offset_keeps_other_classes():
    pred = np.zeros((1, 2, 7), np.float32)  # 2 classes
    for i in range(2):
        pred[0, i, :4] = [100, 100, 40, 40]  # identical boxes
        pred[0, i, 4] = 0.9
        pred[0, i, 5 + i] = 1.0
    dets, valid = non_max_suppression_jit(jnp.asarray(pred), conf_thresh=0.1, iou_thresh=0.5,
                                          max_det=10, pre_nms=16)
    assert int(np.asarray(valid).sum()) == 2  # different classes both survive
    dets, valid = non_max_suppression_jit(jnp.asarray(pred), conf_thresh=0.1, iou_thresh=0.5,
                                          max_det=10, pre_nms=16, agnostic=True)
    assert int(np.asarray(valid).sum()) == 1  # agnostic suppresses


def test_letterbox_params_reference_formula():
    r, left, top, new_w, new_h = letterbox_params(480, 640, (640, 640))
    assert r == 1.0 and new_w == 640 and new_h == 480
    assert left == 0 and top == 80
    r, left, top, new_w, new_h = letterbox_params(1000, 500, (640, 640))
    assert abs(r - 0.64) < 1e-9 and new_h == 640 and new_w == 320


def test_slice_person_head_equivalence():
    """Person-sliced model must equal the person columns of the full model."""
    m80 = YOLOv5(num_cls=80, scale_name="s")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(1, 128, 128, 3)).astype(np.float32))
    v80 = m80.init(jax.random.PRNGKey(1), x)
    full = np.asarray(m80.apply(v80, x))  # [1, N, 85]
    v1 = slice_person_head(jax.tree.map(np.asarray, v80), num_cls=80, slice_idx=0)
    m1 = YOLOv5(num_cls=1, scale_name="s")
    sliced = np.asarray(m1.apply(v1, x))  # [1, N, 6]
    np.testing.assert_allclose(sliced[..., :5], full[..., :5], atol=1e-5)
    np.testing.assert_allclose(sliced[..., 5], full[..., 5], atol=1e-5)


def test_detector_end_to_end_smoke():
    det = YOLOv5Detector(weights_path=None, scale_name="s", scale_size=(256, 256),
                         conf_thresh=0.01, canvas=512)
    img = np.random.default_rng(4).integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    boxes = det.single_predict(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 6
    if len(boxes):
        assert boxes[:, 0].min() >= -1e-3 and boxes[:, 2].max() <= 400 + 1e-3


def test_yolov4_forward():
    from simple_pose_tpu.detector.yolov4 import YOLOv4

    m = YOLOv4(num_cls=80, scale_name="s")
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    n = (16**2 + 8**2 + 4**2) * 3
    assert out.shape == (1, n, 85)
    assert np.all(np.isfinite(np.asarray(out)))


# --------------------------------------------- YOLOv4 blocks: torch oracles
class TMishCBR(tnn.Module):
    def __init__(self, cin, cout, k=1, s=1):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, s, (k - 1) // 2, bias=False)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return tnn.functional.mish(self.bn(self.conv(x)))


class TMishBottleNeck(tnn.Module):
    def __init__(self, c, shortcut=False):
        super().__init__()
        self.conv1 = TMishCBR(c, c, 1)
        self.conv2 = TMishCBR(c, c, 3)
        self.add = shortcut

    def forward(self, x):
        out = self.conv2(self.conv1(x))
        return x + out if self.add else out


class TSPPCSP(tnn.Module):
    """detector/nets/commons.py:140-162 with Mish (yolov4.py wiring)."""

    def __init__(self, cin, cout, k=(5, 9, 13)):
        super().__init__()
        inner = int(2 * cout * 0.5)
        self.conv2 = tnn.Conv2d(cin, inner, 1, 1, bias=False)
        self.conv1_start_0 = TMishCBR(cin, inner, 1)
        self.conv1_start_1 = TMishCBR(inner, inner, 3)
        self.conv1_start_2 = TMishCBR(inner, inner, 1)
        self.pools = tnn.ModuleList([tnn.MaxPool2d(x, 1, x // 2) for x in k])
        self.conv1_end_0 = TMishCBR(4 * inner, inner, 1)
        self.conv1_end_1 = TMishCBR(inner, inner, 3)
        self.bn = tnn.BatchNorm2d(2 * inner)
        self.conv3 = TMishCBR(2 * inner, cout, 1)

    def forward(self, x):
        x1 = self.conv1_start_2(self.conv1_start_1(self.conv1_start_0(x)))
        y1 = torch.cat([x1] + [m(x1) for m in self.pools], dim=1)
        y1 = self.conv1_end_1(self.conv1_end_0(y1))
        y2 = self.conv2(x)
        return self.conv3(tnn.functional.mish(self.bn(torch.cat([y1, y2], dim=1))))


class TBottleNeckCSP2(tnn.Module):
    """detector/nets/commons.py:102-120 with Mish, expansion=1.0
    (yolov4.py neck wiring)."""

    def __init__(self, cin, cout, blocks=1):
        super().__init__()
        inner = int(cout * 1.0)
        self.conv0 = TMishCBR(cin, inner, 1)
        self.conv2 = tnn.Conv2d(inner, inner, 1, 1, bias=False)
        self.conv1 = tnn.Sequential(*[TMishBottleNeck(inner, False) for _ in range(blocks)])
        self.bn = tnn.BatchNorm2d(2 * inner)
        self.conv3 = TMishCBR(2 * inner, cout, 1)

    def forward(self, x):
        x1 = self.conv0(x)
        y1 = self.conv1(x1)
        y2 = self.conv2(x1)
        return self.conv3(tnn.functional.mish(self.bn(torch.cat([y1, y2], dim=1))))


def test_sppcsp_mish_parity_via_generic_converter():
    """Golden-activation test of the YOLOv4-specific SPPCSP block."""
    from simple_pose_tpu.detector.blocks import SPPCSP

    torch.manual_seed(5)
    t = TSPPCSP(16, 8)
    _randomize_bn(t)
    t.eval()
    x = np.random.default_rng(5).normal(size=(2, 16, 16, 16)).astype(np.float32)
    converted, _ = convert_torch_state_generic(t.state_dict())
    f = SPPCSP(8, act=mish)
    variables = f.init(jax.random.PRNGKey(0), jnp.asarray(x))
    merged, missing, unexpected = merge_converted(variables, converted)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    got = np.asarray(f.apply(merged, jnp.asarray(x)))
    with torch.no_grad():
        ref = _to_nhwc(t(_nchw(x)))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_csp2_mish_parity_via_generic_converter():
    """Golden-activation test of the YOLOv4 neck's BottleNeckCSP2."""
    from simple_pose_tpu.detector.blocks import BottleNeckCSP2

    torch.manual_seed(6)
    t = TBottleNeckCSP2(12, 8, blocks=2)
    _randomize_bn(t)
    t.eval()
    x = np.random.default_rng(6).normal(size=(2, 8, 8, 12)).astype(np.float32)
    converted, _ = convert_torch_state_generic(t.state_dict())
    f = BottleNeckCSP2(8, blocks=2, act=mish, expansion=1.0)
    variables = f.init(jax.random.PRNGKey(0), jnp.asarray(x))
    merged, missing, unexpected = merge_converted(variables, converted)
    assert not missing and not unexpected, (missing[:4], unexpected[:4])
    got = np.asarray(f.apply(merged, jnp.asarray(x)))
    with torch.no_grad():
        ref = _to_nhwc(t(_nchw(x)))
    np.testing.assert_allclose(got, ref, atol=3e-5)


def test_yolov4_detector_end_to_end_smoke():
    """model_family='yolov4' runs the full detect wrapper (letterbox -> v4
    forward -> NMS -> unletterbox)."""
    det = YOLOv5Detector(weights_path=None, scale_name="s", scale_size=(256, 256),
                         conf_thresh=0.01, canvas=512, model_family="yolov4")
    img = np.random.default_rng(7).integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    boxes = det.single_predict(img)
    assert boxes.ndim == 2 and boxes.shape[1] == 6
    if len(boxes):
        assert boxes[:, 0].min() >= -1e-3 and boxes[:, 2].max() <= 400 + 1e-3


def test_yolov4_person_head_slice_equivalence():
    """The conversion-time person slicing works on the v4 head too (same
    YOLOHead module)."""
    from simple_pose_tpu.detector.yolov4 import YOLOv4

    m80 = YOLOv4(num_cls=80, scale_name="s")
    x = jnp.asarray(np.random.default_rng(8).normal(size=(1, 128, 128, 3)).astype(np.float32))
    v80 = m80.init(jax.random.PRNGKey(1), x)
    full = np.asarray(m80.apply(v80, x))
    v1 = slice_person_head(jax.tree.map(np.asarray, v80), num_cls=80, slice_idx=0)
    m1 = YOLOv4(num_cls=1, scale_name="s")
    sliced = np.asarray(m1.apply(v1, x))
    np.testing.assert_allclose(sliced[..., :5], full[..., :5], atol=1e-5)
    np.testing.assert_allclose(sliced[..., 5], full[..., 5], atol=1e-5)


def test_detector_amp_matches_f32():
    """bf16 compute must reproduce the f32 detector's decoded boxes to
    tolerance (params f32 either way; the head decodes in f32)."""
    import jax

    from simple_pose_tpu.detector.yolov5 import YOLOv5

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))
    m32 = YOLOv5(num_cls=1, scale_name="s")
    m16 = YOLOv5(num_cls=1, scale_name="s", dtype=jnp.bfloat16)
    v = m32.init(jax.random.PRNGKey(0), x)
    y32 = np.asarray(m32.apply(v, x))
    y16 = np.asarray(m16.apply(v, x))
    assert y16.dtype == np.float32
    # random init -> near-prior outputs; boxes within a pixel, scores close
    assert np.median(np.abs(y32[..., :4] - y16[..., :4])) < 1.0
    assert np.abs(y32[..., 4:] - y16[..., 4:]).mean() < 5e-3


def test_paste_with_border_and_batch_parity():
    """gen_detections and single_predict share the canvas prep
    (paste_with_border): same image -> bit-identical canvases and identical
    boxes through predict_batch (the round-2 edge-bleed fix)."""
    from simple_pose_tpu.detector.wrapper import paste_with_border

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    canvas = np.zeros((512, 512, 3), np.uint8)
    ch, cw = paste_with_border(canvas, img)
    assert (ch, cw) == (300, 400)
    np.testing.assert_array_equal(canvas[:300, :400], img)
    # replicated border rows/cols, zeros beyond
    np.testing.assert_array_equal(canvas[300, :400], img[299])
    np.testing.assert_array_equal(canvas[:301, 400], np.vstack([img[:, 399], img[299:300, 399]]))
    assert canvas[302:].sum() == 0 and canvas[:, 402:].sum() == 0

    det = YOLOv5Detector(weights_path=None, scale_name="s", scale_size=(256, 256),
                         conf_thresh=0.01, canvas=512)
    single = det.single_predict(img)
    batched = det.predict_batch(canvas[None], [(300, 400)])[0]
    np.testing.assert_array_equal(single, batched)


def test_rect_letterbox_params_buckets():
    """Static mod-64 minimum-rectangle buckets (yolov5_detector.py:151-160
    semantics with jittable shapes): r is computed against the FULL target,
    the canvas shrinks to the next multiple of 64."""
    from simple_pose_tpu.detector.wrapper import letterbox_params, rect_letterbox_params

    # 640x480 input -> r=1, 480 is already mod-64-aligned? 480 = 7.5*64 -> 512
    (bw, bh), r, left, top, new_w, new_h = rect_letterbox_params(480, 640, (640, 640))
    assert (bw, bh) == (640, 512) and r == 1.0 and (new_w, new_h) == (640, 480)
    assert top == int(round((512 - 480) / 2 - 0.1)) and left == 0
    # aspect 1:1 -> bucket is the full square, offsets match letterbox_params
    (bw, bh), r, left, top, new_w, new_h = rect_letterbox_params(500, 500, (640, 640))
    assert (bw, bh) == (640, 640)
    assert (r, left, top, new_w, new_h) == letterbox_params(500, 500, (640, 640))
    # r never depends on the bucket
    (_, _), r_wide, *_ = rect_letterbox_params(100, 640, (640, 640))
    assert r_wide == 1.0


def test_rect_predict_batch_square_matches_default():
    """An aspect-1 image buckets to the full square: rect mode must return
    exactly the default path's boxes.  A wide image exercises the grouped
    smaller-bucket program end to end."""
    rng = np.random.default_rng(11)
    cfg = dict(weights_path=None, scale_name="s", scale_size=(256, 256),
               conf_thresh=0.01, canvas=512)
    det = YOLOv5Detector(**cfg)
    det_rect = YOLOv5Detector(**cfg, rect=True)
    sq = rng.integers(0, 255, (300, 300, 3), dtype=np.uint8)
    wide = rng.integers(0, 255, (150, 400, 3), dtype=np.uint8)
    from simple_pose_tpu.detector.wrapper import paste_with_border

    canvases = np.zeros((2, 512, 512, 3), np.uint8)
    paste_with_border(canvases[0], sq)
    paste_with_border(canvases[1], wide)
    shapes = [(300, 300), (150, 400)]
    b_def = det.predict_batch(canvases, shapes)
    b_rect = det_rect.predict_batch(canvases, shapes)
    np.testing.assert_array_equal(b_rect[0], b_def[0])  # same program shape
    assert b_rect[1].ndim == 2 and b_rect[1].shape[1] == 6
    if len(b_rect[1]):
        # boxes stay in original-image coords regardless of bucket
        assert b_rect[1][:, 2].max() <= 400 + 1e-3
        assert b_rect[1][:, 3].max() <= 150 + 1e-3


def test_fused_rect_bucket_square_matches_default():
    from simple_pose_tpu.evalkit.fused import FusedDetectPose

    cfg = dict(pose_model_cfg={"type": "pose_resnet_dconv", "name": "resnet18",
                               "num_joints": 17},
               detector_weights=None, scale_name="s", det_size=(256, 256),
               input_shape=(64, 64), max_people=4, det_conf=0.001, canvas=256, amp=None)
    fused = FusedDetectPose(**cfg)
    fused_rect = FusedDetectPose(**cfg, rect=True)
    rng = np.random.default_rng(13)
    canvases = rng.integers(0, 255, size=(2, 256, 256, 3), dtype=np.uint8)
    # square shapes -> bucket == det_size -> identical program + results
    out_sq = fused(canvases, [(256, 256)] * 2)
    out_sq_r = fused_rect(canvases, [(256, 256)] * 2)
    for k in out_sq:
        np.testing.assert_array_equal(out_sq_r[k], out_sq[k])
    # wide shapes -> smaller bucket; finite results, right shapes
    out_w = fused_rect(canvases, [(128, 256), (100, 256)])
    assert (256, 128) in fused_rect._programs or (128, 256) in fused_rect._programs
    assert out_w["kps"].shape == (2, 4, 17, 2)
    assert np.isfinite(out_w["kps"][out_w["det_valid"]]).all()


def test_predict_batch_device_resident_input_matches_numpy():
    # bench/gen-dets pre-stage canvases with device_put; the wrapper must
    # keep them resident (and index them safely in rect mode) with results
    # identical to host-numpy input
    import jax

    cfg = dict(weights_path=None, scale_name="s", scale_size=(128, 128),
               conf_thresh=0.01, canvas=160)
    rng = np.random.default_rng(7)
    canvases = rng.integers(0, 255, size=(4, 160, 160, 3), dtype=np.uint8)
    shapes = [(120, 160), (160, 160), (96, 160), (160, 160)]
    for rect in (False, True):
        det = YOLOv5Detector(**cfg, rect=rect)
        host = det.predict_batch(canvases, shapes)
        dev = det.predict_batch(jax.device_put(canvases), shapes)
        assert len(host) == len(dev)
        for h, d in zip(host, dev):
            np.testing.assert_allclose(h, d, atol=1e-5)
