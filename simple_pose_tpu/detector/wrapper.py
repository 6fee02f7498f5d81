"""Detector front-end (the YOLOv5Detector equivalent,
detector/yolov5_detector.py:129-239).

TPU-first differences from the reference:
  * The letterbox (ScalePadding) runs on device as a separable-matmul
    resample from the uint8 canvas, composed as an affine with cv2.resize's
    half-pixel-center convention; the 114 padding is applied with a static
    region mask.  Fixed 640x640 output always (the reference's mod-64
    "minimum rectangle" would make shapes dynamic, which XLA cannot jit; the
    extra padding is inert except for a few border pixels).
  * Person-class head slicing happens at weight-conversion time by slicing
    the head conv kernels/biases to [x, y, w, h, obj, person] -- no MConv2D
    module surgery (yolov5_detector.py:201-213).
  * NMS is the jittable fixed-size version (detector/nms.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simple_pose_tpu.detector.nms import non_max_suppression_jit
from simple_pose_tpu.detector.yolov5 import YOLOv5
from simple_pose_tpu.ops.warp import affine_crop_separable

__all__ = ["letterbox_params", "paste_with_border", "slice_person_head",
           "YOLOv5Detector", "PersonDetector"]


def paste_with_border(canvas: np.ndarray, img: np.ndarray):
    """Paste ``img`` at the canvas origin and replicate a 1px border so the
    device letterbox's edge taps clamp like cv2.resize instead of bleeding
    into the zero padding.  Shared by single_predict and gen_detections so
    both detection paths see identical canvas pixels.

    :returns: (ch, cw) pasted extent."""
    ch = min(img.shape[0], canvas.shape[0])
    cw = min(img.shape[1], canvas.shape[1])
    canvas[:ch, :cw] = img[:ch, :cw]
    if ch < canvas.shape[0]:
        canvas[ch, :cw] = canvas[ch - 1, :cw]
    if cw < canvas.shape[1]:
        canvas[:ch + 1, cw] = canvas[:ch + 1, cw - 1]
    return ch, cw


def letterbox_params(h, w, target=(640, 640), scale_up=True):
    """Scale/offset of the reference ScalePadding.make_border
    (yolov5_detector.py:145-166) with minimum_rectangle=False.

    :returns: (r, left, top, new_w, new_h)"""
    tw, th = target
    r = min(th / h, tw / w)
    if not scale_up:
        r = min(r, 1.0)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    dw, dh = (tw - new_w) / 2, (th - new_h) / 2
    left, top = int(round(dw - 0.1)), int(round(dh - 0.1))
    return r, left, top, new_w, new_h


def _letterbox_trans(r, left, top):
    """src->dst affine with cv2.resize half-pixel centers:
    dst = r*(src + 0.5) - 0.5 + offset."""
    return np.array(
        [[r, 0.0, r * 0.5 - 0.5 + left], [0.0, r, r * 0.5 - 0.5 + top]], dtype=np.float32
    )


def rect_letterbox_params(h, w, target=(640, 640), mod=64, scale_up=True):
    """Minimum-rectangle letterbox quantized to STATIC mod-``mod`` buckets.

    The reference's minimum_rectangle mode (yolov5_detector.py:151-160) pads
    the scaled image only to the next multiple of 64 instead of the full
    square -- a real FLOP saving on non-square images (640x448 vs 640x640 =
    -30% pixels) that a dynamic-shape port can't jit.  Here the scale ``r``
    is still computed against the FULL target (identical box geometry), but
    the program runs at the quantized (bw, bh) bucket; each distinct bucket
    compiles once and is cached by jit.

    :returns: ((bw, bh), r, left, top, new_w, new_h)"""
    tw, th = target
    r = min(th / h, tw / w)
    if not scale_up:
        r = min(r, 1.0)
    new_w, new_h = int(round(w * r)), int(round(h * r))
    bw = min(tw, -(-new_w // mod) * mod)
    bh = min(th, -(-new_h // mod) * mod)
    dw, dh = (bw - new_w) / 2, (bh - new_h) / 2
    left, top = int(round(dw - 0.1)), int(round(dh - 0.1))
    return (bw, bh), r, left, top, new_w, new_h


def _geom_to_arrays(geom):
    """[(r, left, top, new_w, new_h)] -> (trans [B,2,3], region [B,4])."""
    b = len(geom)
    trans = np.zeros((b, 2, 3), np.float32)
    region = np.zeros((b, 4), np.float32)
    for i, (r, left, top, new_w, new_h) in enumerate(geom):
        trans[i] = _letterbox_trans(r, left, top)
        region[i] = [left, top, left + new_w, top + new_h]
    return trans, region


def _letterbox_input(canvases, trans, region, th, tw, lb_dtype):
    """Device letterbox: separable resample from the uint8 canvas, 114 pad
    via the static region mask, BGR->RGB, /255 -- the network-ready input."""
    crops = affine_crop_separable(canvases, trans, (th, tw), out_dtype=lb_dtype)
    xs = jnp.arange(tw, dtype=jnp.float32)[None, None, :]
    ys = jnp.arange(th, dtype=jnp.float32)[None, :, None]
    lx, ty_, rx, by = (region[:, i, None, None] for i in range(4))
    inside = (xs >= lx) & (xs < rx) & (ys >= ty_) & (ys < by)
    crops = jnp.where(inside[..., None], crops, jnp.asarray(114.0, lb_dtype))
    return crops[..., ::-1] / 255.0  # canvas is BGR like cv.imread; net eats RGB


def slice_person_head(variables, num_cls=80, anchor_per_grid=3, slice_idx=0):
    """Slice the 80-class head convs to person-only [x,y,w,h,obj,cls_i]
    (weight-conversion-time replacement for MConv2D surgery)."""
    import copy

    out = copy.deepcopy(variables)
    num_out = num_cls + 5
    cols = [0, 1, 2, 3, 4, 5 + slice_idx]
    head = out["params"]["head"]
    for name, leaf in head.items():
        k = leaf["kernel"]  # [1, 1, in, apg*num_out]
        b = leaf["bias"]
        kh, kw, cin, _ = k.shape
        k = k.reshape(kh, kw, cin, anchor_per_grid, num_out)[..., cols].reshape(
            kh, kw, cin, anchor_per_grid * len(cols)
        )
        b = b.reshape(anchor_per_grid, num_out)[:, cols].reshape(-1)
        leaf["kernel"] = jnp.asarray(k)
        leaf["bias"] = jnp.asarray(b)
    return out


class YOLOv5Detector:
    """Person detector for the detect -> crop -> pose pipeline.

    model_family: 'yolov5' (detector/nets/yolov5.py) or 'yolov4'
    (detector/nets/yolov4.py:148-164) -- both share the anchor head and the
    ['ema'] checkpoint layout, so weight loading and person-head slicing are
    identical."""

    def __init__(self, weights_path: Optional[str] = None, num_cls: int = 80,
                 scale_name: str = "l", scale_size: Tuple[int, int] = (640, 640),
                 iou_thresh: float = 0.6, conf_thresh: float = 0.001,
                 slice_idx: int = 0, canvas: int = 1280,
                 model_family: str = "yolov5", amp="auto", mesh=None,
                 rect: bool = False, quant=None, quant_scales=None):
        self.mesh = mesh  # optional Mesh: batch axis sharded over 'data'
        from simple_pose_tpu.models.quant import QUANT_MODES, quantized

        if quant not in QUANT_MODES:
            raise ValueError(f"quant={quant!r}; expected one of {QUANT_MODES}")
        self.quant = quant
        # calibrated {conv-path: s_x} statics (models/quant.py); None keeps
        # the dynamic per-batch activation scales
        self.quant_scales = quant_scales
        # rect=True: minimum-rectangle letterboxing via static mod-64 shape
        # buckets (rect_letterbox_params) -- the reference's
        # minimum_rectangle mode made jittable
        self.rect = rect
        self.scale_size = scale_size
        self.iou_thresh = iou_thresh
        self.conf_thresh = conf_thresh
        self.canvas = canvas
        self.num_cls = num_cls if slice_idx < 0 else 1
        # bf16 compute on TPU (params f32; the head decodes boxes in f32);
        # same amp rule as the pose models (registry.resolve_amp_dtype)
        from simple_pose_tpu.models.registry import resolve_amp_dtype

        dtype = resolve_amp_dtype(amp)
        if model_family == "yolov5":
            self.model = YOLOv5(num_cls=self.num_cls, scale_name=scale_name, dtype=dtype)
        elif model_family == "yolov4":
            from simple_pose_tpu.detector.yolov4 import YOLOv4

            self.model = YOLOv4(num_cls=self.num_cls, scale_name=scale_name, dtype=dtype)
        else:
            raise KeyError(f"unknown detector family {model_family!r}")

        x0 = jnp.zeros((1, scale_size[1], scale_size[0], 3), jnp.float32)
        if weights_path:
            import torch

            from simple_pose_tpu.convert.torch2flax import convert_torch_state_generic, merge_converted

            raw = torch.load(weights_path, map_location="cpu", weights_only=False)
            if isinstance(raw, dict) and "ema" in raw:
                raw = raw["ema"]
            converted, _ = convert_torch_state_generic(raw)
            if slice_idx >= 0:
                converted = slice_person_head(converted, num_cls, slice_idx=slice_idx)
            variables = self.model.init(jax.random.PRNGKey(0), x0)
            self.variables, missing, unexpected = (lambda m: (m[0], m[1], m[2]))(
                merge_converted(variables, converted)
            )
            if missing or unexpected:
                print(f"detector load: {len(missing)} missing, {len(unexpected)} unexpected")
        else:
            self.variables = self.model.init(jax.random.PRNGKey(0), x0)

        # letterbox resample emits the network's compute dtype directly (f32
        # accumulate, narrowed write): kills the stem's convert_element_type
        # pass flagged in the fused-step trace (docs/PERF.md)
        lb_dtype = dtype or jnp.float32
        self._lb_dtype = lb_dtype

        def make_forward(th, tw):
            def forward(variables, canvases, trans, region):
                x = _letterbox_input(canvases, trans, region, th, tw, lb_dtype)
                # quant='w8a8': int8-MXU conv forward (models/quant.py);
                # self.quant_scales is read at trace time, so calibrate()'s
                # cache reset bakes the statics into the rebuilt programs
                with quantized(quant, self.quant_scales):
                    return self.model.apply(variables, x)

            return jax.jit(forward)

        # one jitted forward per static letterbox shape (the default square
        # plus any mod-64 rect buckets); compiled once each, cached
        self._forwards = {}
        self._make_forward = make_forward
        self._forward = self._forward_for(scale_size[1], scale_size[0])
        if mesh is not None:
            from simple_pose_tpu.parallel.mesh import replicated

            self.variables = jax.device_put(self.variables, replicated(mesh))

    def _forward_for(self, th, tw):
        if (th, tw) not in self._forwards:
            self._forwards[(th, tw)] = self._make_forward(th, tw)
        return self._forwards[(th, tw)]

    def calibrate(self, batches, num_batches: int = 2) -> dict:
        """Record static w8a8 activation scales on detection batches, then
        rebuild the jitted forwards with them as compile-time constants (the
        deployed detector loses every dynamic per-batch max-reduce).

        ``batches`` yields ``(canvases_u8 [B,c,c,3] BGR, shapes [(h,w)])``
        pairs -- the same prep as :meth:`predict_batch`.  The float forward
        runs un-jitted at the default square letterbox; scales are per
        conv path, so rect buckets reuse them.  Multi-host: max-reduced
        across processes.  Returns the {conv-path: s_x} dict (persist via
        ``models.quant.save_scales``)."""
        from simple_pose_tpu.models.quant import ScaleRecorder, allreduce_scales_max

        if self.quant is None:
            raise ValueError("calibrate() requires a quant mode (quant='w8a8')")
        tw, th = self.scale_size
        rec = ScaleRecorder()
        n = 0
        for canvases_u8, shapes in batches:
            if n >= num_batches:
                break
            geom = [letterbox_params(h, w, self.scale_size) for h, w in shapes]
            trans, region = _geom_to_arrays(geom)
            x = _letterbox_input(jnp.asarray(np.asarray(canvases_u8)),
                                 jnp.asarray(trans), jnp.asarray(region),
                                 th, tw, self._lb_dtype)
            with rec:
                self.model.apply(self.variables, x)
            n += 1
        if n == 0:
            raise ValueError("calibrate() got an empty batch stream")
        self.quant_scales = allreduce_scales_max(rec.scales())
        self._forwards = {}
        self._forward = self._forward_for(th, tw)
        return self.quant_scales

    def _run_group(self, canvases_u8, geom, th, tw, merge, max_det, use_mesh):
        """Forward + NMS + box unmapping for one static letterbox shape.

        geom: [(r, left, top, new_w, new_h)] per image.
        :returns: list of [n, 6] arrays in original pixel coords"""
        trans, region = _geom_to_arrays(geom)
        # keep device-resident canvases resident (np.asarray would force D2H)
        if not isinstance(canvases_u8, jax.Array):
            canvases_u8 = np.asarray(canvases_u8)
        batch_args = (canvases_u8, trans, region)
        if use_mesh:
            from simple_pose_tpu.parallel.mesh import batch_sharding

            batch_args = tuple(
                jax.device_put(a, batch_sharding(self.mesh)) for a in batch_args)
        else:
            batch_args = tuple(jnp.asarray(a) for a in batch_args)
        pred = self._forward_for(th, tw)(self.variables, *batch_args)
        dets, valid = non_max_suppression_jit(
            pred, conf_thresh=self.conf_thresh, iou_thresh=self.iou_thresh,
            max_det=max_det, multi_label=True, merge=merge,
        )
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        out = []
        for i, (r, left, top, _, _) in enumerate(geom):
            d = dets[i][valid[i]].copy()
            d[:, [0, 2]] = np.clip(d[:, [0, 2]], 0, tw)
            d[:, [1, 3]] = np.clip(d[:, [1, 3]], 0, th)
            d[:, [0, 2]] = (d[:, [0, 2]] - left) / r
            d[:, [1, 3]] = (d[:, [1, 3]] - top) / r
            out.append(d)
        return out

    def predict_batch(self, canvases_u8, shapes, merge=True, max_det=300):
        """:param canvases_u8: [B, canvas, canvas, 3] uint8 BGR, images pasted
            at the origin
        :param shapes: [(h, w)] original sizes
        :returns: list of [n, 6] numpy arrays (x1, y1, x2, y2, conf, cls) in
            original pixel coords"""
        if not isinstance(canvases_u8, jax.Array):
            canvases_u8 = np.asarray(canvases_u8)
        if not self.rect:
            tw, th = self.scale_size
            geom = [letterbox_params(h, w, self.scale_size) for h, w in shapes]
            return self._run_group(canvases_u8, geom, th, tw, merge, max_det,
                                   use_mesh=self.mesh is not None)
        # rect mode: group images by their static mod-64 bucket; one jitted
        # program per bucket shape (compiled once, cached).  Sharding over a
        # mesh only applies to groups whose size divides the data axis.
        buckets, infos = {}, []
        for i, (h, w) in enumerate(shapes):
            (bw, bh), r, left, top, new_w, new_h = rect_letterbox_params(h, w, self.scale_size)
            buckets.setdefault((bh, bw), []).append(i)
            infos.append((r, left, top, new_w, new_h))
        out = [None] * len(shapes)
        n_data = int(self.mesh.shape.get("data", 1)) if self.mesh is not None else 1
        for (bh, bw), idxs in buckets.items():
            group = self._run_group(
                canvases_u8[np.asarray(idxs)], [infos[i] for i in idxs], bh, bw, merge, max_det,
                use_mesh=self.mesh is not None and len(idxs) % n_data == 0)
            for i, d in zip(idxs, group):
                out[i] = d
        return out

    def single_predict(self, img_bgr: np.ndarray):
        """Reference-parity API (yolov5_detector.py:217-239): BGR image in,
        [n, 6] boxes in original pixel coords out."""
        h, w = img_bgr.shape[:2]
        canvas = np.zeros((self.canvas, self.canvas, 3), np.uint8)
        paste_with_border(canvas, img_bgr)
        return self.predict_batch(canvas[None], [(h, w)])[0]


# the wrapper serves both detector families; keep the reference-parity name
# as the canonical one and this alias for call sites that pick the family
PersonDetector = YOLOv5Detector
