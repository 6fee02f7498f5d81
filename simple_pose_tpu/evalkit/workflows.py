"""Evaluation workflows (the four eval.py flows of the reference).

  * predicts_by_gt          -> eval.py:30-66: GT-box eval on the keypoints
                               val set, GaussTaylor decode, COCO AP.
  * predicts_by_detections  -> eval.py:101-150: eval on an external person-
                               detection json (e.g. the shared
                               COCO_val2017_detections_AP_H_56_person.json).
  * rescore_and_filter      -> eval.py:153-197: per-image rescoring
                               (box_score * mean(kp conf > 0.2)) + OKS-NMS
                               at 0.9, then COCO AP.
  * gen_detections          -> eval.py:69-98: run the person detector over
                               the val set (simple_pose_tpu.detector).

Extras over the reference:
  * flip-test heatmap averaging (flip_test=True): forward the horizontally
    flipped crop, flip the heatmaps back, swap left/right channels, shift
    one pixel right (the SimpleBaselines convention), and average -- the
    reference trains with flip aug but never flip-tests.
  * weights can be a reference .pth checkpoint (converted on the fly) or an
    Orbax checkpoint directory from PoseSolver.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from simple_pose_tpu.data.coco import JOINT_PAIRS, load_coco_keypoints, load_detection_boxes
from simple_pose_tpu.data.pipeline import RGB_MEAN, DetBoxPipeline, PosePipeline
from simple_pose_tpu.metrics.cocoeval import evaluate_map
from simple_pose_tpu.models.registry import build_from_cfg, resolve_amp_dtype
from simple_pose_tpu.parallel.mesh import host_prefetch
from simple_pose_tpu.ops.decode import decode_basic, decode_gauss_taylor, instance_scores
from simple_pose_tpu.ops.oks import oks_nms
from simple_pose_tpu.ops.warp import affine_crop_separable

__all__ = [
    "PoseEvaluator",
    "predicts_by_gt",
    "predicts_by_detections",
    "rescore_and_filter",
    "kps_to_dicts",
    "load_model_variables",
]


def _flip_perm(num_joints: int):
    perm = list(range(num_joints))
    for a, b in JOINT_PAIRS:
        if a < num_joints and b < num_joints:
            perm[a], perm[b] = perm[b], perm[a]
    return tuple(perm)


def kps_to_dicts(kps, conf, scores, img_ids, out_list):
    """COCO result dicts; score = mean(conf) + max(conf)
    (kps_to_dict_ parity, pose_metrics.py:172-179)."""
    for kp, cf, sc, img_id in zip(kps, conf, scores, img_ids):
        out_list.append(
            {
                "image_id": int(img_id),
                "score": float(sc),
                "category_id": 1,
                "keypoints": np.concatenate([kp, cf], axis=-1).reshape(-1).tolist(),
            }
        )


def _gather_results(out: dict, meta: dict, mesh) -> dict:
    """One numpy dict of evaluator outputs + host metadata for the full
    (global) batch.

    Single-process: numpy views, pass-through.  Multi-host: every host holds
    only its shard of the sharded outputs and only its own metadata, so
    convert global arrays to the host-local shard and process_allgather
    everything tiled -- each host then builds the full result list (the
    reference instead evals on rank 0 only, ddp_pose_resnet_solver.py:
    153-155; same discipline as PoseSolver.validate)."""
    if mesh is None or jax.process_count() == 1:
        return {**{k: np.asarray(v) for k, v in out.items()}, **meta}
    from jax.experimental import multihost_utils as mhu
    from jax.sharding import PartitionSpec as P

    host_out = {}
    for k, v in out.items():
        if isinstance(v, jax.Array) and not isinstance(v, np.ndarray):
            v = mhu.global_array_to_host_local_array(v, mesh, P("data"))
        host_out[k] = np.asarray(v)
    return mhu.process_allgather({**host_out, **meta}, tiled=True)


def _process_shard_kwargs(mesh) -> dict:
    """Pipeline kwargs sharding the record stream per host (multi-host)."""
    if mesh is None or jax.process_count() == 1:
        return {}
    return {"process_index": jax.process_index(),
            "process_count": jax.process_count()}


def load_model_variables(model_cfg: dict, weights: Optional[str], crop_shape, dtype=None):
    """Build the eval model and load weights from a torch .pth (reference
    layout, ['ema'] key) or an Orbax checkpoint directory (PoseSolver layout,
    uses ema_params).  ``dtype`` is the flax compute dtype (params f32)."""
    model = build_from_cfg(model_cfg, train=False, dtype=dtype)
    x = jnp.zeros((1,) + tuple(crop_shape) + (3,), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    if not weights:
        return model, variables
    if weights.endswith((".pth", ".pt")):
        import torch

        from simple_pose_tpu.convert.torch2flax import convert_torch_state, merge_converted

        raw = torch.load(weights, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "ema" in raw:
            raw = raw["ema"]
        family = "hrnet" if model_cfg["type"] == "pose_hrnet" else "resnet"
        converted, _ = convert_torch_state(raw, family)
        merged, missing, unexpected = merge_converted(variables, converted)
        if missing or unexpected:
            print(f"load: {len(missing)} missing, {len(unexpected)} unexpected")
        return model, merged
    # Orbax directory (a PoseSolver checkpoint).  Restore templateless: the
    # solver saves params/EMA *plus* opt_state/step/epoch/val_ap
    # (train/solver.py save_checkpoint), and a partial template is a hard
    # error in orbax StandardRestore -- so take the full saved tree and pick
    # the EMA leaves (what the reference evals with, eval.py ['ema']).
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(os.path.abspath(weights))
    loaded = {"params": restored["ema_params"],
              "batch_stats": restored["ema_batch_stats"]}
    # structural check against the freshly initialized model (loud failure
    # beats a silently wrong apply)
    jax.tree.map(lambda a, b: None, variables["params"], loaded["params"])
    return model, loaded


class PoseEvaluator:
    """Jitted batched crop -> forward -> (flip-test) -> decode.

    mesh: optional jax.sharding.Mesh -- shards the batch axis over the
    'data' axis so the eval program uses every chip of a slice (the solver's
    validate sharding applied to the standalone workflows; the reference's
    eval is single-GPU, eval.py:101-150).  Batch size must divide by the
    data-axis size."""

    # keys the jitted step consumes; everything else in a batch dict is
    # host-side metadata and never crosses H2D
    _DEVICE_KEYS = ("canvas", "canvas_idx", "trans", "trans_inv")

    def __init__(self, model_cfg: dict, weights: Optional[str] = None,
                 input_shape=(192, 256), decoder: str = "gauss_taylor",
                 flip_test: bool = False, amp="auto", mesh=None,
                 quant: Optional[str] = None, quant_scales: Optional[dict] = None,
                 fused_layer1: bool = False):
        """quant_scales: calibrated activation scales
        (models/quant.calibrate_w8a8) -- compile-time constants replacing the
        dynamic per-batch max-reduce.

        fused_layer1: fold eval-mode BN into layer1's Bottleneck chain and
        run it as ONE VMEM-resident Pallas kernel (ops/pallas_bottleneck;
        docs/PERF.md round 4 -- 1.35x on the chain).  Single-device only
        (pallas_call has no SPMD partition rule); with quant='w8a8' the
        fused layer1 stays in the compute dtype (its convs bypass the int8
        interceptor)."""
        from simple_pose_tpu.models.quant import QUANT_MODES, quantized

        if quant not in QUANT_MODES:
            raise ValueError(f"quant={quant!r}; expected one of {QUANT_MODES}")
        self.quant = quant
        self.quant_scales = quant_scales
        self.crop_shape = (input_shape[1], input_shape[0])
        self.out_shape = (input_shape[1] // 4, input_shape[0] // 4)
        self.mesh = mesh
        self.model, self.variables = load_model_variables(
            model_cfg, weights, self.crop_shape, dtype=resolve_amp_dtype(amp))
        if mesh is not None:
            from simple_pose_tpu.parallel.mesh import replicated

            self.variables = jax.device_put(self.variables, replicated(mesh))
        self._layer1_folded = None
        if fused_layer1:
            if mesh is not None:
                raise ValueError(
                    "fused_layer1 is single-device (pallas_call has no SPMD "
                    "partition rule); drop mesh= or fused_layer1=")
            from simple_pose_tpu.ops.pallas_bottleneck import fold_bottleneck_blocks

            names = getattr(self.model, "layer1_block_names", lambda: None)()
            if not names:
                raise ValueError(
                    f"fused_layer1: {model_cfg.get('type')} has no foldable "
                    "Bottleneck layer1 (BasicBlock trunks and grouped convs "
                    "don't qualify)")
            self._layer1_folded = fold_bottleneck_blocks(
                self.variables["params"], self.variables["batch_stats"], names)
        self.num_joints = model_cfg.get("num_joints", 17)
        self.flip_test = flip_test
        # 'dark_original' = the reference's third public decoder
        # (DarkPoseOriginalKeyPointDecoder, pose_metrics.py:110-169): host-
        # side loop numpy; the jitted program then stops at the heatmaps.
        self._host_decode = decoder == "dark_original"
        self._decode = decode_basic if decoder == "basic" else decode_gauss_taylor
        self._flip_perm = jnp.asarray(_flip_perm(self.num_joints))
        self._crop_fn = lambda c, t: affine_crop_separable(c, t, self.crop_shape)
        self._step = self._build_step(quant_scales)

    def _build_step(self, quant_scales):
        """Jit the crop->forward->decode step; ``quant_scales`` entries become
        compile-time constants (see :meth:`calibrate`)."""
        from simple_pose_tpu.models.quant import quantized

        mesh, quant, flip_test = self.mesh, self.quant, self.flip_test
        crop_fn, decode, flip_perm = self._crop_fn, self._decode, self._flip_perm
        host_decode = self._host_decode

        def step(variables, layer1_folded, batch):
            if "canvas_idx" in batch:  # dedup'd batch: one canvas per image
                if mesh is not None:
                    from simple_pose_tpu.parallel.mesh import bucketed_gather_crop

                    crops = bucketed_gather_crop(crop_fn, mesh)(
                        batch["canvas"], batch["trans"], batch["canvas_idx"])
                else:
                    crops = crop_fn(batch["canvas"][batch["canvas_idx"]], batch["trans"])
            else:
                crops = crop_fn(batch["canvas"], batch["trans"])
            x = crops / 255.0 - RGB_MEAN
            # quant='w8a8' swaps every nn.Conv for the int8-MXU forward
            # (models/quant.py) at trace time; None is a no-op context
            with quantized(quant, quant_scales):
                heat = self.model.apply(
                    variables, x, layer1_folded=layer1_folded,
                ).transpose(0, 3, 1, 2).astype(jnp.float32)
            if flip_test:
                xf = x[:, :, ::-1, :]
                with quantized(quant, quant_scales):
                    hf = self.model.apply(
                        variables, xf, layer1_folded=layer1_folded,
                    ).transpose(0, 3, 1, 2).astype(jnp.float32)
                hf = hf[:, flip_perm, :, ::-1]
                # SimpleBaselines convention: shift flipped maps 1px right
                hf = jnp.concatenate([hf[..., :1], hf[..., :-1]], axis=-1)
                heat = (heat + hf) * 0.5
            if host_decode:
                return {"heat": heat}
            kps, conf = decode(heat, batch["trans_inv"])
            return {"kps": kps, "conf": conf, "scores": instance_scores(conf)}

        return jax.jit(step)

    def calibrate(self, batches, num_batches: int = 2) -> dict:
        """Record static w8a8 activation scales on eval batches, then rebuild
        the jitted step with them as compile-time constants -- the deployed
        program loses every dynamic per-batch max-reduce.

        ``batches`` is a pipeline batch stream (e.g. ``pipe.epoch(0)``); the
        first ``num_batches`` are cropped and forwarded un-jitted with the
        recording interceptor (models/quant.calibrate_w8a8).  Returns the
        {conv-path: s_x} dict (persist via ``models.quant.save_scales`` and
        feed ``eval.py export --scales`` for a fully static serving
        artifact).  Multi-host: scales are max-reduced across processes so
        every host traces the identical SPMD program."""
        from simple_pose_tpu.models.quant import allreduce_scales_max, calibrate_w8a8

        if self.quant is None:
            raise ValueError("calibrate() requires a quant mode (quant='w8a8')")
        inputs = []
        for i, batch in enumerate(batches):
            if i >= num_batches:
                break
            canvas = jnp.asarray(batch["canvas"])
            if "canvas_idx" in batch:
                canvas = canvas[jnp.asarray(batch["canvas_idx"])]
            x = self._crop_fn(canvas, jnp.asarray(batch["trans"])) / 255.0 - RGB_MEAN
            inputs.append(x)
            if self.flip_test:  # the flipped forward quantizes too
                inputs.append(x[:, :, ::-1, :])
        if not inputs:
            raise ValueError("calibrate() got an empty batch stream")
        scales = allreduce_scales_max(calibrate_w8a8(
            lambda x: self.model.apply(self.variables, x), inputs))
        self.quant_scales = scales
        self._step = self._build_step(scales)
        return scales

    def __call__(self, batch):
        dev = {k: batch[k] for k in self._DEVICE_KEYS if k in batch}
        if self.mesh is not None:
            from simple_pose_tpu.parallel.mesh import shard_batch

            dev = shard_batch(dev, self.mesh)
        out = self._step(self.variables, self._layer1_folded, dev)
        if self._host_decode:
            from simple_pose_tpu.ops.decode import decode_dark_original

            heat = out["heat"]
            if self.mesh is not None and jax.process_count() > 1:
                # decode is per-sample: each host decodes its own shard
                # (batch["trans_inv"] IS the local shard under multi-host)
                from jax.experimental import multihost_utils as mhu
                from jax.sharding import PartitionSpec as P

                heat = mhu.global_array_to_host_local_array(heat, self.mesh, P("data"))
            kps, conf = decode_dark_original(np.asarray(heat), batch["trans_inv"])
            scores = conf[..., 0].mean(-1) + conf[..., 0].max(-1)
            return {"kps": kps, "conf": conf, "scores": scores}
        return out


def _dedup_plan(batch_size: int, dedup: bool, mesh) -> dict:
    """Canvas-dedup pipeline kwargs, bucketed per mesh data-axis shard so the
    bucket-local gather stays device-local (parallel/mesh.bucketed_gather_crop).

    batch_size is the per-HOST batch: under multi-host each host packs its
    local batch into (global data size / process count) buckets -- one per
    local device -- and the global array concatenates host shards in device
    order."""
    if not dedup:
        return {}
    n_buckets = int(mesh.shape.get("data", 1)) if mesh is not None else 1
    n_buckets = max(1, n_buckets // jax.process_count())
    per_bucket = max(1, (batch_size // 2) // n_buckets)
    return {"dedup_canvases": per_bucket * n_buckets, "dedup_buckets": n_buckets}


def _maybe_calibrate(ev: "PoseEvaluator", pipe, quant_calib: int,
                     quant_scales_out: Optional[str]) -> None:
    """Workflow-level static-scale calibration: run the evaluator's recorder
    over the first ``quant_calib`` batches of a fresh (deterministic,
    unshuffled) epoch, then optionally persist the scales."""
    if not quant_calib:
        return
    ev.calibrate(pipe.epoch(0), quant_calib)
    if quant_scales_out:
        from simple_pose_tpu.models.quant import save_scales

        save_scales(ev.quant_scales, quant_scales_out)


def _eval_prefetch(batches, mesh):
    """Prefetched batch stream for the eval loops: mesh-sharded staging when
    a mesh is given, plain async device_put otherwise."""
    if mesh is not None:
        from simple_pose_tpu.parallel.mesh import device_prefetch

        return device_prefetch(batches, mesh, device_keys=PoseEvaluator._DEVICE_KEYS)
    return host_prefetch(batches)


def predicts_by_gt(img_root, ann_path, model_cfg, weights=None, batch_size=32,
                   input_shape=(192, 256), decoder="gauss_taylor", flip_test=False,
                   out_path="test_gt_kpt.json", canvas=640, debug=0, dedup=True,
                   amp="auto", mesh=None, quant=None, quant_calib=0,
                   quant_scales=None, quant_scales_out=None, fused_layer1=False):
    """GT-box eval (eval.py:30-66).  Returns the stats dict.

    quant_calib: calibrate static w8a8 activation scales on the first N
    batches before the eval loop (PoseEvaluator.calibrate); quant_scales
    feeds precomputed scales; quant_scales_out persists calibrated scales."""
    records = load_coco_keypoints(img_root, ann_path, debug=debug)
    pipe = PosePipeline(records, batch_size, input_shape=input_shape,
                        output_shape=(input_shape[0] // 4, input_shape[1] // 4),
                        canvas=canvas, augment=False, shuffle=False, drop_last=False,
                        **_process_shard_kwargs(mesh),
                        **_dedup_plan(batch_size, dedup, mesh))
    ev = PoseEvaluator(model_cfg, weights, input_shape, decoder, flip_test, amp=amp,
                       mesh=mesh, quant=quant, quant_scales=quant_scales,
                       fused_layer1=fused_layer1)
    _maybe_calibrate(ev, pipe, quant_calib, quant_scales_out)
    results = []
    for batch in _eval_prefetch(pipe.epoch(0), mesh):
        out = ev(batch)
        g = _gather_results(out, {"img_id": batch["img_id"], "valid": batch["valid"]},
                            mesh)
        keep = g["valid"] > 0.5
        kps_to_dicts(g["kps"][keep], g["conf"][keep], g["scores"][keep],
                     g["img_id"][keep], results)
    with open(out_path, "w") as wf:
        json.dump(results, wf)
    return evaluate_map(out_path, ann_path)


def predicts_by_detections(img_root, det_json_path, gt_ann_path, model_cfg, weights=None,
                           batch_size=32, input_shape=(192, 256), decoder="gauss_taylor",
                           flip_test=False, out_path="predicts_kps_temp.json", canvas=640,
                           in_vis_thre=0.2, oks_thre=0.9, debug=0, dedup=True, amp="auto",
                           mesh=None, quant=None, quant_calib=0, quant_scales=None,
                           quant_scales_out=None, fused_layer1=False):
    """Detector-box eval + OKS-NMS rescoring (eval.py:101-150 + 153-197).

    Returns the stats dict of the rescored/filtered predictions."""
    records = load_detection_boxes(img_root, det_json_path, debug=debug)
    pipe = DetBoxPipeline(records, batch_size, input_shape=input_shape,
                          output_shape=(input_shape[0] // 4, input_shape[1] // 4),
                          canvas=canvas, **_process_shard_kwargs(mesh),
                          **_dedup_plan(batch_size, dedup, mesh))
    ev = PoseEvaluator(model_cfg, weights, input_shape, decoder, flip_test, amp=amp,
                       mesh=mesh, quant=quant, quant_scales=quant_scales,
                       fused_layer1=fused_layer1)
    _maybe_calibrate(ev, pipe, quant_calib, quant_scales_out)
    predictions = []
    for batch in _eval_prefetch(pipe.epoch(0), mesh):
        out = ev(batch)
        g = _gather_results(
            {"kps": out["kps"], "conf": out["conf"]},
            {"img_id": batch["img_id"], "valid": batch["valid"],
             "area": batch["area"], "score": batch["score"]}, mesh)
        for b in range(g["kps"].shape[0]):
            if g["valid"][b] < 0.5:
                continue
            predictions.append(
                {
                    "kps": np.concatenate([g["kps"][b], g["conf"][b]], -1)
                           .reshape(-1).tolist(),
                    "area": float(g["area"][b]),
                    "score": float(g["score"][b]),
                    "img_id": int(g["img_id"][b]),
                }
            )
    with open(out_path, "w") as wf:
        json.dump(predictions, wf)
    return rescore_and_filter(out_path, gt_ann_path, in_vis_thre, oks_thre)


def rescore_and_filter(predictions, gt_ann_path, in_vis_thre=0.2, oks_thre=0.9,
                       out_path="filter_kps_predicts.json"):
    """Per-image rescoring + greedy OKS-NMS (temp_read_in_and_filter parity,
    eval.py:153-197).  ``predictions`` is a path or the list itself."""
    if isinstance(predictions, str):
        with open(predictions) as rf:
            predictions = json.load(rf)
    by_img = defaultdict(list)
    for p in predictions:
        by_img[p["img_id"]].append(p)

    filtered = []
    for img_id, img_kpts in by_img.items():
        kpts_list, score_list, area_list = [], [], []
        for n_p in img_kpts:
            kpt_item = np.array(n_p["kps"]).reshape(-1, 3)
            kpt_scores = kpt_item[:, -1]
            valid = kpt_scores > in_vis_thre
            kpt_score = kpt_scores[valid].mean() if valid.sum() > 0 else 0.0
            kpts_list.append(kpt_item)
            score_list.append(n_p["score"] * kpt_score)
            area_list.append(n_p["area"])
        kpts_arr = np.stack(kpts_list, axis=0)
        scores = np.array(score_list)
        areas = np.array(area_list)
        keep = oks_nms(kpts_arr, scores, areas, oks_thre)
        if len(keep) != 0:
            kpts_arr = kpts_arr[keep]
            scores = scores[keep]
        for kpt, sc in zip(kpts_arr, scores):
            filtered.append(
                {
                    "image_id": int(img_id),
                    "score": float(sc),
                    "category_id": 1,
                    "keypoints": kpt.reshape(-1).tolist(),
                }
            )
    with open(out_path, "w") as wf:
        json.dump(filtered, wf)
    return evaluate_map(out_path, gt_ann_path)


def gen_detections(img_root, ann_path, detector=None, out_path="person_detections.json",
                   batch_size=8, conf_thresh=0.25, iou_thresh=0.5, canvas=1280,
                   weights_path=None, scale_name="l", debug=0,
                   detector_family="yolov5", amp="auto", mesh=None,
                   quant_calib=0, quant_scales_out=None):
    """Run the person detector over the val images and dump a COCO-format
    detection json consumable by predicts_by_detections
    (gen_data_by_detector parity, eval.py:69-98; the output format is the
    standard COCO detection-results schema instead of the reference's ad-hoc
    one, so the two workflows chain directly).

    quant_calib: with a quant='w8a8' detector, calibrate static activation
    scales on the first N batches before detecting (YOLOv5Detector.
    calibrate); quant_scales_out persists them as JSON.
    """
    import itertools

    import cv2 as cv

    from simple_pose_tpu.detector.wrapper import YOLOv5Detector, paste_with_border

    if mesh is not None and jax.process_count() > 1:
        # pose workflows are multi-host (process-sharded + allgather); the
        # detection dump is an offline one-off (reference: single GPU,
        # eval.py:69-98) -- run it on one controller per slice
        raise NotImplementedError(
            "gen_detections supports a single-controller mesh only; run it "
            "single-process (its output json then feeds the multi-host "
            "predicts_by_detections)")
    if detector is None:
        detector = YOLOv5Detector(weights_path=weights_path, scale_name=scale_name,
                                  conf_thresh=conf_thresh, iou_thresh=iou_thresh, canvas=canvas,
                                  model_family=detector_family, amp=amp, mesh=mesh)
    with open(ann_path) as rf:
        images = json.load(rf)["images"]
    if debug:
        images = images[:debug]
    def batches():
        for start in range(0, len(images), batch_size):
            chunk = images[start:start + batch_size]
            canvases = np.zeros((len(chunk), canvas, canvas, 3), np.uint8)
            shapes = []
            for i, entry in enumerate(chunk):
                file_name = entry.get("coco_url", entry.get("file_name", "")).split("/")[-1]
                img = cv.imread(os.path.join(img_root, file_name))
                h, w = img.shape[:2]
                # same prep as single_predict (incl. the 1px replicate border
                # so letterbox edge taps clamp like cv2.resize)
                paste_with_border(canvases[i], img)
                shapes.append((h, w))
            if len(chunk) < batch_size:  # keep jit shapes fixed
                pad = batch_size - len(chunk)
                canvases = np.concatenate(
                    [canvases, np.zeros((pad, canvas, canvas, 3), np.uint8)])
                shapes += [(canvas, canvas)] * pad
            yield chunk, canvases, shapes

    stream = batches()
    if quant_calib and detector.quant:
        # static-scale calibration on the leading batches, then replay them
        # through the rebuilt (fully static) detector programs
        head = list(itertools.islice(stream, quant_calib))
        detector.calibrate(((c, s) for _, c, s in head), quant_calib)
        if quant_scales_out:
            from simple_pose_tpu.models.quant import save_scales

            save_scales(detector.quant_scales, quant_scales_out)
        stream = itertools.chain(head, stream)
    results = []
    for chunk, canvases, shapes in stream:
        boxes_list = detector.predict_batch(canvases, shapes)
        for entry, boxes in zip(chunk, boxes_list):
            for x1, y1, x2, y2, score, _cls in boxes:
                results.append({
                    "image_id": entry["id"], "category_id": 1,
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "score": float(score),
                })
    with open(out_path, "w") as wf:
        json.dump(results, wf)
    return results


def detect_then_pose(img_root, ann_path, pose_model_cfg, pose_weights=None,
                     detector_weights=None, scale_name="l", det_conf=0.25, det_iou=0.5,
                     batch_size=32, input_shape=(192, 256), flip_test=False,
                     work_dir=".", debug=0, detector_family="yolov5", amp="auto",
                     mesh=None, quant=None, quant_calib=0, quant_scales=None,
                     quant_scales_out=None):
    """End-to-end detect -> crop -> pose -> rescoring AP
    (README.md:94-106 workflow; BASELINE.json config #5)."""
    det_path = os.path.join(work_dir, "person_detections.json")
    gen_detections(img_root, ann_path, out_path=det_path, conf_thresh=det_conf,
                   iou_thresh=det_iou, weights_path=detector_weights,
                   scale_name=scale_name, debug=debug, detector_family=detector_family,
                   amp=amp, mesh=mesh)
    return predicts_by_detections(
        img_root, det_path, ann_path, pose_model_cfg, weights=pose_weights,
        batch_size=batch_size, input_shape=input_shape, flip_test=flip_test,
        out_path=os.path.join(work_dir, "predicts_kps_temp.json"), amp=amp, mesh=mesh,
        quant=quant, quant_calib=quant_calib, quant_scales=quant_scales,
        quant_scales_out=quant_scales_out,
    )
