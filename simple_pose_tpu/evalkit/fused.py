"""Fused detect -> crop -> pose: ONE jitted device program.

The reference chains two separate processes through json files (eval.py:
69-98 then 101-150).  Here the whole path runs as a single XLA program per
image batch (BASELINE.json config #5): device letterbox -> YOLOv5 forward ->
fixed-size NMS (top max_people person boxes) -> batched box->affine geometry
(ops/affine_jax.py) -> multi-crop separable resample (P crops per image
without replicating canvases) -> pose forward -> GaussTaylor decode -> kps in
original image coords.  Ragged person counts are handled with fixed-size
padding + validity masks throughout (NMS validity x detector score).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_pose_tpu.data.pipeline import RGB_MEAN
from simple_pose_tpu.detector.nms import non_max_suppression_jit
from simple_pose_tpu.detector.wrapper import YOLOv5Detector, letterbox_params, _letterbox_trans
from simple_pose_tpu.evalkit.workflows import load_model_variables, resolve_amp_dtype
from simple_pose_tpu.ops.affine_jax import affine_crop_separable_multi, boxes_to_crop_affines
from simple_pose_tpu.ops.decode import decode_gauss_taylor, decode_basic, instance_scores
from simple_pose_tpu.ops.warp import affine_crop_separable

__all__ = ["FusedDetectPose", "fused_eval"]


class FusedDetectPose:
    """End-to-end person detection + pose estimation as one device program."""

    def __init__(self, pose_model_cfg: dict, pose_weights: Optional[str] = None,
                 detector_weights: Optional[str] = None, scale_name: str = "l",
                 det_size=(640, 640), input_shape=(192, 256), max_people: int = 16,
                 det_conf: float = 0.25, det_iou: float = 0.5, decoder: str = "gauss_taylor",
                 canvas: int = 1280, detector_family: str = "yolov5", amp="auto",
                 mesh=None, rect: bool = False, quant=None, quant_scales=None):
        """mesh: optional jax.sharding.Mesh -- shards the image batch over the
        'data' axis so the fused program uses every chip of a slice (image
        batch must divide by the data-axis size; weights are replicated).

        rect: minimum-rectangle letterboxing -- the detector stage runs at
        the batch's max mod-64 bucket instead of always det_size (the
        reference's minimum_rectangle mode, yolov5_detector.py:151-160, as
        static shape buckets; each bucket compiles its own fused program,
        cached).

        quant: 'w8a8' runs every conv of BOTH nets on the int8 MXU path
        (models/quant.py).

        quant_scales: calibrated statics as {"detector": {...}, "pose":
        {...}} (each a {conv-path: s_x} dict, one per net so module paths
        cannot collide); None keeps dynamic per-batch activation scales.
        Produce with :meth:`calibrate`."""
        from simple_pose_tpu.models.quant import QUANT_MODES, quantized

        if quant not in QUANT_MODES:
            raise ValueError(f"quant={quant!r}; expected one of {QUANT_MODES}")
        self.quant = quant
        self.quant_scales = quant_scales
        self.canvas = canvas
        self.det_size = det_size
        self.max_people = max_people
        self.mesh = mesh
        self.rect = rect
        self.detector = YOLOv5Detector(
            weights_path=detector_weights, scale_name=scale_name, scale_size=det_size,
            conf_thresh=det_conf, iou_thresh=det_iou, canvas=canvas,
            model_family=detector_family, amp=amp,
        )
        crop_shape = (input_shape[1], input_shape[0])
        amp_dtype = resolve_amp_dtype(amp)
        self.pose_model, self.pose_vars = load_model_variables(
            pose_model_cfg, pose_weights, crop_shape, dtype=amp_dtype)
        decode = decode_basic if decoder == "basic" else decode_gauss_taylor
        # device letterbox emits the detector's compute dtype (f32 resample,
        # narrowed write) -- removes the stem convert pass (docs/PERF.md)
        lb_dtype = amp_dtype or jnp.float32

        def make_body(th, tw, det_ctx, pose_ctx):
          """Fused program body with injectable per-net contexts: the jitted
          programs pass quantized(...) factories; calibrate() passes
          ScaleRecorders and runs the body eagerly."""
          def program(det_vars, pose_vars, canvases, lb_trans, lb_region, lb_inv_scale, lb_offset):
              # ---- detect (device letterbox + YOLOv5 + NMS)
              lb = affine_crop_separable(canvases, lb_trans, (th, tw), out_dtype=lb_dtype)
              xs = jnp.arange(tw, dtype=jnp.float32)[None, None, :]
              ys = jnp.arange(th, dtype=jnp.float32)[None, :, None]
              inside = (
                  (xs >= lb_region[:, 0, None, None]) & (xs < lb_region[:, 2, None, None])
                  & (ys >= lb_region[:, 1, None, None]) & (ys < lb_region[:, 3, None, None])
              )
              lb = jnp.where(inside[..., None], lb, jnp.asarray(114.0, lb_dtype))
              with det_ctx():
                  pred = self.detector.model.apply(det_vars, lb[..., ::-1] / 255.0)
              dets, valid = non_max_suppression_jit(
                  pred, conf_thresh=det_conf, iou_thresh=det_iou,
                  max_det=max_people, multi_label=True, merge=True,
              )
              # ---- boxes back to source-canvas coords
              boxes = dets[..., :4]
              boxes = jnp.clip(boxes, 0.0, jnp.asarray([tw, th, tw, th], jnp.float32))
              boxes = (boxes - jnp.tile(lb_offset, 2)[:, None, :]) * lb_inv_scale[:, None, None]
              det_scores = dets[..., 4]
              # ---- crop geometry + P crops per image
              trans, trans_inv = boxes_to_crop_affines(boxes, input_shape,
                                                       (input_shape[0] // 4, input_shape[1] // 4))
              # pose crops emit the compute dtype (A/B'd on hardware: within
              # noise of f32 crops at half the HBM write, docs/PERF.md r3)
              crops = affine_crop_separable_multi(canvases, trans, crop_shape,
                                                  out_dtype=lb_dtype)  # [B,P,h,w,C]
              b = crops.shape[0]
              # canvases are BGR (cv.imread); the pose net eats RGB, mean-subtracted
              x = (crops.reshape((b * max_people,) + crop_shape + (3,))[..., ::-1] / 255.0
                   - jnp.asarray(RGB_MEAN, lb_dtype))
              with pose_ctx():
                  heat = self.pose_model.apply(pose_vars, x).transpose(0, 3, 1, 2).astype(jnp.float32)
              kps, conf = decode(heat, trans_inv.reshape(b * max_people, 2, 3))
              scores = instance_scores(conf)
              pp = lambda a: a.reshape((b, max_people) + a.shape[1:])
              return {
                  "boxes": boxes, "det_scores": det_scores, "det_valid": valid,
                  "kps": pp(kps), "kp_conf": pp(conf), "pose_scores": pp(scores),
              }

          return program

        def make_program(th, tw):
            qs = self.quant_scales or {}
            det_ctx = lambda: quantized(quant, qs.get("detector"))
            pose_ctx = lambda: quantized(quant, qs.get("pose"))
            return jax.jit(make_body(th, tw, det_ctx, pose_ctx))

        self._programs = {}
        self._make_program = make_program
        self._make_body = make_body
        tw, th = det_size
        self._program = self._program_for(th, tw)
        if mesh is not None:
            from simple_pose_tpu.parallel.mesh import replicated

            self.detector.variables = jax.device_put(self.detector.variables, replicated(mesh))
            self.pose_vars = jax.device_put(self.pose_vars, replicated(mesh))

    def _program_for(self, th, tw):
        if (th, tw) not in self._programs:
            self._programs[(th, tw)] = self._make_program(th, tw)
        return self._programs[(th, tw)]

    def calibrate(self, batches, num_batches: int = 2) -> dict:
        """Record static w8a8 activation scales for BOTH nets on image
        batches, then rebuild the fused programs with them as compile-time
        constants (no dynamic max-reduce anywhere in the deployed program).

        ``batches`` yields ``(canvases_u8 [B,canvas,canvas,3] BGR,
        shapes [(h,w)])`` pairs -- the same contract as :meth:`__call__`.
        The fused body runs EAGERLY with float forwards and a ScaleRecorder
        around each net, so the pose-net scales are recorded on the actual
        detector-driven crops.  Multi-host: max-reduced across processes.
        Returns {"detector": {...}, "pose": {...}} (persist via
        ``models.quant.save_scales`` per net)."""
        from simple_pose_tpu.models.quant import ScaleRecorder, allreduce_scales_max

        if self.quant is None:
            raise ValueError("calibrate() requires a quant mode (quant='w8a8')")
        rec_det, rec_pose = ScaleRecorder(), ScaleRecorder()
        tw, th = self.det_size
        body = self._make_body(th, tw, lambda: rec_det, lambda: rec_pose)
        n = 0
        for canvases_u8, shapes in batches:
            if n >= num_batches:
                break
            lb_trans, lb_region, lb_inv_scale, lb_offset = self.host_prep(shapes)
            body(self.detector.variables, self.pose_vars,
                 jnp.asarray(np.asarray(canvases_u8)), jnp.asarray(lb_trans),
                 jnp.asarray(lb_region), jnp.asarray(lb_inv_scale),
                 jnp.asarray(lb_offset))
            n += 1
        if n == 0:
            raise ValueError("calibrate() got an empty batch stream")
        self.quant_scales = {"detector": allreduce_scales_max(rec_det.scales()),
                             "pose": allreduce_scales_max(rec_pose.scales())}
        self._programs = {}
        self._program = self._program_for(th, tw)
        return self.quant_scales

    def host_prep(self, shapes, run_size=None):
        """Per-image letterbox geometry (host side): returns
        (lb_trans [B,2,3], lb_region [B,4], lb_inv_scale [B], lb_offset [B,2]).

        run_size: actual program canvas (a rect bucket <= det_size); the
        scale r is always computed against det_size so box geometry is
        independent of the bucket, only the centering offset changes."""
        b = len(shapes)
        tw, th = run_size or self.det_size
        lb_trans = np.zeros((b, 2, 3), np.float32)
        lb_region = np.zeros((b, 4), np.float32)
        lb_inv_scale = np.zeros((b,), np.float32)
        lb_offset = np.zeros((b, 2), np.float32)
        for i, (h, w) in enumerate(shapes):
            r, _, _, new_w, new_h = letterbox_params(h, w, self.det_size)
            left = int(round((tw - new_w) / 2 - 0.1))
            top = int(round((th - new_h) / 2 - 0.1))
            lb_trans[i] = _letterbox_trans(r, left, top)
            lb_region[i] = [left, top, left + new_w, top + new_h]
            lb_inv_scale[i] = 1.0 / r
            lb_offset[i] = [left, top]
        return lb_trans, lb_region, lb_inv_scale, lb_offset

    def _pick_bucket(self, shapes):
        """Batch bucket for rect mode: the max mod-64 rect over the batch."""
        from simple_pose_tpu.detector.wrapper import rect_letterbox_params

        bw = bh = 0
        for h, w in shapes:
            (w_i, h_i), *_ = rect_letterbox_params(h, w, self.det_size)
            bw, bh = max(bw, w_i), max(bh, h_i)
        return bh, bw

    def __call__(self, canvases_u8, shapes, img_ids=None):
        """:param canvases_u8: [B, canvas, canvas, 3] uint8 BGR at origin
        :param shapes: [(h, w)] true image sizes
        :param img_ids: optional per-image host metadata ([B] ints) carried
            through the gather — under multi-host the returned arrays are
            GLOBAL (allgathered over processes, workflows._gather_results
            discipline), so callers need the matching global ids
        :returns: dict of numpy arrays; entries masked by det_valid"""
        if self.rect:
            th, tw = self._pick_bucket(shapes)
            if self.mesh is not None and jax.process_count() > 1:
                # every host must trace/dispatch the SAME static program:
                # max-reduce the mod-64 bucket across processes
                from jax.experimental import multihost_utils as mhu

                g = np.asarray(mhu.process_allgather(
                    np.array([th, tw], np.int32))).reshape(-1, 2)
                th, tw = int(g[:, 0].max()), int(g[:, 1].max())
            program = self._program_for(th, tw)
            lb_trans, lb_region, lb_inv_scale, lb_offset = self.host_prep(
                shapes, run_size=(tw, th))
        else:
            program = self._program
            lb_trans, lb_region, lb_inv_scale, lb_offset = self.host_prep(shapes)
        batch = {
            "canvases": np.asarray(canvases_u8), "lb_trans": lb_trans,
            "lb_region": lb_region, "lb_inv_scale": lb_inv_scale,
            "lb_offset": lb_offset,
        }
        if self.mesh is not None:
            from simple_pose_tpu.parallel.mesh import shard_batch

            batch = shard_batch(batch, self.mesh)
        else:
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
        # unpack by key: pytree ops (device_put/shard_batch) rebuild dicts in
        # SORTED key order, so *batch.values() would shuffle the args
        out = program(self.detector.variables, self.pose_vars,
                      batch["canvases"], batch["lb_trans"], batch["lb_region"],
                      batch["lb_inv_scale"], batch["lb_offset"])
        from simple_pose_tpu.evalkit.workflows import _gather_results

        meta = {} if img_ids is None else {"img_ids": np.asarray(img_ids, np.int64)}
        return _gather_results(out, meta, self.mesh)


def fused_eval(img_root, ann_path, pose_model_cfg, pose_weights=None,
               detector_weights=None, scale_name="l", det_conf=0.25,
               det_iou=0.5, batch_size=8, input_shape=(192, 256),
               max_people: int = 16, canvas: int = 1280, det_size=(640, 640),
               decoder: str = "gauss_taylor", detector_family: str = "yolov5",
               amp="auto", mesh=None, rect: bool = False, quant=None,
               quant_calib: int = 0, quant_scales=None, quant_scales_out=None,
               in_vis_thre: float = 0.2, oks_thre: float = 0.9, debug: int = 0,
               out_path: str = "fused_kps_temp.json", fused=None):
    """End-to-end AP eval with the SINGLE fused device program.

    The two-stage workflow (``detect_then_pose`` / ``eval.py e2e``) chains
    gen_detections -> predicts_by_detections like the reference's two
    processes (eval.py:69-98 then 101-150); this one runs evalkit/fused.py's
    one XLA program per image batch (letterbox -> detector -> NMS -> crops ->
    pose -> decode on device), then the same host rescoring chain
    (temp_read_in_and_filter parity, eval.py:153-197).  Per-instance area
    and score follow the detector-box dataset convention (naive_data.py:
    33-56: area = padded-scale product, score = detector box score).

    quant_calib: with quant='w8a8', calibrate static per-net activation
    scales on the first N batches (FusedDetectPose.calibrate); the
    {"detector", "pose"} scales dict persists to ``quant_scales_out`` as
    JSON and feeds back via ``quant_scales``.  Returns the stats dict.
    """
    import itertools

    import cv2 as cv

    from simple_pose_tpu.detector.wrapper import paste_with_border
    from simple_pose_tpu.evalkit.workflows import rescore_and_filter
    from simple_pose_tpu.ops.affine import box_to_center_scale

    if fused is None:
        fused = FusedDetectPose(
            pose_model_cfg, pose_weights, detector_weights, scale_name=scale_name,
            det_size=det_size, input_shape=input_shape, max_people=max_people,
            det_conf=det_conf, det_iou=det_iou, decoder=decoder, canvas=canvas,
            detector_family=detector_family, amp=amp, mesh=mesh, rect=rect,
            quant=quant, quant_scales=quant_scales)
    with open(ann_path) as rf:
        images = json.load(rf)["images"]
    if debug:
        images = images[:debug]

    # multi-host: shard images per process with EQUALIZED per-host batch
    # counts (None pads) so every host dispatches the same global program
    # the same number of times; outputs allgather so each host builds the
    # full prediction list (the standalone-workflow discipline,
    # workflows._gather_results / _process_shard_kwargs)
    import jax

    nproc = jax.process_count() if fused.mesh is not None else 1
    if nproc > 1:
        per_host = -(-len(images) // nproc)
        images = list(images[jax.process_index()::nproc])
        images += [None] * (per_host - len(images))

    def batches():
        for start in range(0, len(images), batch_size):
            chunk = images[start:start + batch_size]
            canvases = np.zeros((batch_size, canvas, canvas, 3), np.uint8)
            shapes, ids = [], []
            for i, entry in enumerate(chunk):
                if entry is None:  # equalization pad (multi-host)
                    shapes.append((canvas, canvas))
                    ids.append(-1)
                    continue
                file_name = entry.get("coco_url", entry.get("file_name", "")).split("/")[-1]
                img = cv.imread(os.path.join(img_root, file_name))
                h, w = img.shape[:2]
                paste_with_border(canvases[i], img)
                shapes.append((h, w))
                ids.append(int(entry["id"]))
            pad = batch_size - len(chunk)  # keep jit shapes fixed
            shapes += [(canvas, canvas)] * pad
            ids += [-1] * pad
            yield ids, canvases, shapes

    stream = batches()
    if quant_calib and fused.quant:
        head = list(itertools.islice(stream, quant_calib))
        fused.calibrate(((c, s) for _, c, s in head), quant_calib)
        if quant_scales_out:
            with open(quant_scales_out, "w") as wf:
                json.dump({net: {k: float(v) for k, v in d.items()}
                           for net, d in fused.quant_scales.items()}, wf, indent=1)
        stream = itertools.chain(head, stream)

    in_w, in_h = input_shape
    predictions = []
    for ids, canvases, shapes in stream:
        out = fused(canvases, shapes, img_ids=ids)
        gids = out["img_ids"]  # global under multi-host (allgathered)
        for i in range(len(gids)):
            if gids[i] < 0:  # batch/equalization pad
                continue
            for p in range(max_people):
                if out["det_valid"][i, p] < 0.5:
                    continue
                x1, y1, x2, y2 = out["boxes"][i, p]
                _, scale = box_to_center_scale(
                    float(x1), float(y1), float(x2 - x1), float(y2 - y1),
                    in_w / in_h)
                kc = np.concatenate(
                    [out["kps"][i, p], out["kp_conf"][i, p]], axis=-1)
                predictions.append({
                    "kps": kc.reshape(-1).tolist(),
                    "area": float(scale[0] * scale[1]),
                    "score": float(out["det_scores"][i, p]),
                    "img_id": int(gids[i]),
                })
    with open(out_path, "w") as wf:
        json.dump(predictions, wf)
    return rescore_and_filter(out_path, ann_path, in_vis_thre, oks_thre)
