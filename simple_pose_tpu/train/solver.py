"""SPMD training/validation solver: one pjit program over a device mesh.

Replaces all three reference solvers (processors/dp_pose_resnet_solver.py,
dp_pose_hrnet_solver.py, ddp_pose_resnet_solver.py): DP, DDP and SyncBN
collapse into a single jitted train step whose batch dimension is sharded
over the ``data`` mesh axis -- XLA inserts gradient and BatchNorm-statistic
reductions over ICI, so there is no DataParallel wrapper, no NCCL setup, no
DistributedSampler and no separate SyncBN conversion.

The step fuses the whole per-batch pipeline on device:
  uint8 canvases -> affine crop (ops/warp.py) -> normalize (mean-subtract
  only, datasets/coco.py:134-136) -> model forward -> unbiased heatmap
  targets (ops/heatmap.py) -> masked MSE 0.5*mean((pred*m - tgt*m)^2)
  (dp_pose_resnet_solver.py:107) -> Adam update -> EMA.

Checkpointing (best/last keyed on val AP, plus optimizer state and step for
resume -- which the reference lacks) uses Orbax.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from simple_pose_tpu.data.coco import load_coco_keypoints
from simple_pose_tpu.data.pipeline import RGB_MEAN, PosePipeline
from simple_pose_tpu.metrics.acc import heatmap_accuracy
from simple_pose_tpu.metrics.cocoeval import evaluate_map
from simple_pose_tpu.models.registry import build_from_cfg
from simple_pose_tpu.ops.decode import decode_basic, decode_gauss_taylor, instance_scores
from simple_pose_tpu.ops.heatmap import encode_biased, encode_unbiased
from simple_pose_tpu.ops.warp import affine_crop, affine_crop_mxu, affine_crop_separable
from simple_pose_tpu.parallel.mesh import (
    bucketed_gather_crop, device_prefetch, make_mesh, replicated)
from simple_pose_tpu.train import schedules as S
from simple_pose_tpu.train.config import TrainConfig, load_config
from simple_pose_tpu.train.ema import ema_update

__all__ = ["TrainState", "PoseSolver", "make_train_step", "make_val_step"]


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    step: jnp.ndarray


def _normalize(crops):
    """RGB [0,255] float -> reference normalization (mean only, no std).

    Dtype-preserving: bf16 crops normalize in bf16 (no silent f32 upcast
    from the numpy mean constant)."""
    return crops / 255.0 - jnp.asarray(RGB_MEAN, crops.dtype)


def make_train_step(train_model, tx, out_shape=(64, 48), crop_shape=(256, 192), amp=False,
                    crop_impl="auto", ema: bool = True, encoding: str = "unbiased",
                    mesh=None):
    """Build the jitted SPMD train step: (state, batch) -> (state, metrics).

    crop_impl: 'pallas' (fused VMEM kernel, fastest on TPU), 'mxu' (XLA
    one-hot matmul warp), 'gather' (exact-parity reference path), or 'auto'
    (pallas on TPU, mxu elsewhere).
    ema=False skips the moving average; the ema_* slots then track the raw
    weights, matching the reference's habit of storing the raw state under
    the checkpoint's "ema" key when ModelEMA is disabled
    (dp_pose_resnet_solver.py:86,181).
    encoding: 'unbiased' (RefineSimpleTransform) or 'biased'
    (BasicSimpleTransform, commons/transforms.py:80-116).  The pipeline
    supplies joints in heatmap coordinates (already divided by the stride),
    so the biased path snaps with stride=1.
    mesh: required for canvas-dedup batches (a 'canvas_idx' key): the
    pipeline packs crops and their source canvases into per-device buckets
    with bucket-LOCAL slot indices, and the canvas gather runs inside
    shard_map over the 'data' axis -- each device reads only its own canvas
    shard, so dedup adds zero cross-device traffic."""
    if crop_impl == "auto":
        crop_impl = "pallas" if jax.default_backend() == "tpu" else "mxu"
    inter = int(np.ceil(np.hypot(*crop_shape))) + 8
    if crop_impl == "pallas":
        from simple_pose_tpu.ops.pallas_warp import affine_crop_pallas

        # under amp the kernel writes bf16 directly (f32 accumulate): half
        # the crop's HBM write, and the normalize below reads bf16
        crop_dtype = jnp.bfloat16 if amp else jnp.float32
        crop_fn = lambda c, t: affine_crop_pallas(c, t, crop_shape, inter=inter,
                                                  out_dtype=crop_dtype)
    elif crop_impl == "mxu":
        crop_fn = lambda c, t: affine_crop_mxu(c, t, crop_shape, inter=inter)
    else:
        crop_fn = lambda c, t: affine_crop(c, t, crop_shape)

    if encoding == "unbiased":
        encode_fn = lambda j: encode_unbiased(j, out_shape)
    elif encoding == "biased":
        encode_fn = lambda j: encode_biased(j, out_shape, stride=1)
    else:
        raise KeyError(encoding)

    def make_crops(batch):
        if "canvas_idx" not in batch:
            return crop_fn(batch["canvas"], batch["trans"])
        if mesh is None:
            return crop_fn(batch["canvas"][batch["canvas_idx"]], batch["trans"])
        mapped = bucketed_gather_crop(crop_fn, mesh)
        return mapped(batch["canvas"], batch["trans"], batch["canvas_idx"])

    def train_step(state: TrainState, batch):
        crops = make_crops(batch)
        if amp:
            # mixed precision proper lives in the model (flax compute
            # dtype=bfloat16, params float32).  Normalize directly IN bf16
            # (cast fused into the crop's epilogue) instead of writing an
            # f32 normalized batch and converting: removes a full
            # [B,256,192,3] f32 round-trip + convert_element_type pass
            # (PERF.md round-3 candidate; <=1 ulp of bf16 vs cast-after).
            x = _normalize(crops.astype(jnp.bfloat16))
        else:
            x = _normalize(crops)
        targets, weights = encode_fn(batch["joints"])
        mask = weights[..., None, None]

        def loss_fn(params):
            preds, updates = train_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                mutable=["batch_stats"],
            )
            preds = preds.transpose(0, 3, 1, 2).astype(jnp.float32)  # NHWC -> NCHW
            loss = 0.5 * jnp.mean((preds * mask - targets * mask) ** 2)
            return loss, (preds, updates["batch_stats"])

        (loss, (preds, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        step = state.step + 1
        if ema:
            new_ema_params = ema_update(state.ema_params, new_params, step)
            new_ema_stats = ema_update(state.ema_batch_stats, new_stats, step)
        else:
            new_ema_params, new_ema_stats = new_params, new_stats
        acc = heatmap_accuracy(preds * mask, targets * mask)
        metrics = {"loss": loss, "acc": acc}
        return (
            state.replace(
                params=new_params,
                batch_stats=new_stats,
                opt_state=new_opt_state,
                ema_params=new_ema_params,
                ema_batch_stats=new_ema_stats,
                step=step,
            ),
            metrics,
        )

    return train_step


def make_val_step(eval_model, decoder="basic", out_shape=(64, 48), crop_shape=(256, 192), use_ema=False):
    """Jitted validation step: forward + decode + loss/acc metrics.

    decoder: 'basic' (resnet solvers, dp_pose_resnet_solver.py:92) or
    'gauss_taylor' (hrnet solver / eval workflows)."""
    decode = decode_basic if decoder == "basic" else decode_gauss_taylor

    def val_step(state: TrainState, batch):
        crops = affine_crop_separable(batch["canvas"], batch["trans"], crop_shape)
        x = _normalize(crops)
        params = state.ema_params if use_ema else state.params
        stats = state.ema_batch_stats if use_ema else state.batch_stats
        preds = eval_model.apply({"params": params, "batch_stats": stats}, x)
        preds = preds.transpose(0, 3, 1, 2).astype(jnp.float32)
        targets, weights = encode_unbiased(batch["joints"], out_shape)
        mask = weights[..., None, None]
        loss = 0.5 * jnp.mean((preds * mask - targets * mask) ** 2)
        acc = heatmap_accuracy(preds * mask, targets * mask)
        kps, maxvals = decode(preds, batch["trans_inv"])
        scores = instance_scores(maxvals)
        return {"loss": loss, "acc": acc, "kps": kps, "kp_conf": maxvals, "scores": scores}

    return val_step


class PoseSolver:
    """End-to-end trainer (the DP/DDP Processor equivalent)."""

    def __init__(self, cfg, mesh=None):
        self.cfg: TrainConfig = cfg if isinstance(cfg, TrainConfig) else load_config(cfg)
        cfgd = self.cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfgd.mesh)

        amp_dtype = jnp.bfloat16 if cfgd.optim.amp else None
        self.train_model = build_from_cfg(vars(cfgd.model), train=True, dtype=amp_dtype)
        self.eval_model = build_from_cfg(vars(cfgd.model), train=False, dtype=amp_dtype)
        in_w, in_h = cfgd.data.input_shape
        self.crop_shape = (in_h, in_w)
        self.out_shape = (in_h // 4, in_w // 4)

        # data
        self.train_pipe = self.val_pipe = None
        if cfgd.data.train_ann_path:
            recs = load_coco_keypoints(cfgd.data.train_img_root, cfgd.data.train_ann_path,
                                       cfgd.data.debug, check_center=cfgd.data.check_center)
            # per-HOST buckets: batch_size is the per-host batch; each host
            # packs its local slice of the data axis
            n_data = int(self.mesh.shape.get("data", 1))
            n_buckets = max(1, n_data // jax.process_count())
            dedup_canvases = 0
            if cfgd.data.dedup and cfgd.data.dedup_ratio > 0:
                per_bucket = max(1, int(round(
                    cfgd.data.batch_size * cfgd.data.dedup_ratio / n_buckets)))
                dedup_canvases = per_bucket * n_buckets
            self.train_pipe = PosePipeline(
                recs, cfgd.data.batch_size, input_shape=cfgd.data.input_shape,
                output_shape=(in_w // 4, in_h // 4), canvas=cfgd.data.canvas,
                augment=cfgd.data.augment, seed=cfgd.seed, num_threads=cfgd.data.num_workers,
                aug_scale=cfgd.data.aug_scale, aug_rot=cfgd.data.aug_rot,
                aug_flip=cfgd.data.aug_flip,
                process_index=jax.process_index(), process_count=jax.process_count(),
                dedup_canvases=dedup_canvases, dedup_buckets=n_buckets,
            )
        if cfgd.data.val_ann_path:
            recs = load_coco_keypoints(cfgd.data.val_img_root, cfgd.data.val_ann_path,
                                       cfgd.data.debug, check_center=cfgd.data.check_center)
            # val is sharded per host too (the reference instead idles
            # ranks != 0, ddp_pose_resnet_solver.py:153-155); results are
            # allgathered in validate()
            self.val_pipe = PosePipeline(
                recs, cfgd.data.batch_size, input_shape=cfgd.data.input_shape,
                output_shape=(in_w // 4, in_h // 4), canvas=cfgd.data.canvas,
                augment=False, shuffle=False, drop_last=False, seed=cfgd.seed,
                num_threads=cfgd.data.num_workers,
                process_index=jax.process_index(), process_count=jax.process_count(),
            )

        self._steps_per_epoch = self.train_pipe.batches_per_epoch() if self.train_pipe else 1000
        self.schedule = self._build_schedule(self._steps_per_epoch)
        self.tx = self._build_optimizer()
        self.state = None
        self.best_ap = 0.0
        self._train_step = None
        self._val_step = None

    # -- construction ------------------------------------------------------

    def _build_schedule(self, steps_per_epoch, warmup_start=0.0):
        o = self.cfg.optim
        if o.schedule == "multistep":
            return S.multistep_schedule(o.lr, o.milestones, o.gamma, steps_per_epoch)
        if o.schedule == "warmup_cosine_multistep":
            return S.warmup_cosine_multistep_schedule(
                o.lr, o.epochs, o.milestones, steps_per_epoch, o.warm_up_epoch, alpha=o.gamma,
                warmup_start=warmup_start,
            )
        if o.schedule == "epoch_warmup_cosine":
            return S.epoch_warmup_cosine_schedule(
                o.lr, o.epochs, steps_per_epoch, o.warm_up_epoch, warmup_start=warmup_start
            )
        raise KeyError(self.cfg.optim.schedule)

    def _build_optimizer(self):
        o = self.cfg.optim

        def base_tx(schedule):
            # NOT optax.flatten: the ravel/unravel copies measured 4.5%
            # slower end to end than per-leaf updates inside the fused step
            # (docs/PERF.md)
            if o.optimizer.lower() == "adam":
                return optax.adam(schedule)
            if o.optimizer.lower() == "sgd":
                return optax.sgd(schedule, momentum=o.momentum)
            raise KeyError(o.optimizer)

        if not o.split_groups:
            tx = base_tx(self.schedule)
            if o.weight_decay:
                tx = optax.chain(optax.add_decayed_weights(o.weight_decay, mask=_decay_mask), tx)
            return tx
        # split_optimizer parity (commons/optims_utils.py:8-32): three param
        # groups -- weight-decayed kernels / biases / norm scales -- where
        # the bias group warms up from absolute lr 0.1 instead of 0
        # (optims_utils.py:68-72).
        decay_tx = base_tx(self.schedule)
        if o.weight_decay:
            decay_tx = optax.chain(optax.add_decayed_weights(o.weight_decay), decay_tx)
        bias_tx = base_tx(self._build_schedule(self._steps_per_epoch, warmup_start=0.1))
        return optax.multi_transform(
            {"decay": decay_tx, "bias": bias_tx, "other": base_tx(self.schedule)},
            _group_labels,
        )

    def init_state(self, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        x = jnp.zeros((1,) + self.crop_shape + (3,), jnp.float32)
        variables = self.train_model.init(rng, x)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        if self.cfg.model.pretrained:
            params, batch_stats = self._load_pretrained(params, batch_stats)
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=self.tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params),
            ema_batch_stats=jax.tree.map(jnp.copy, batch_stats),
            step=jnp.zeros((), jnp.int32),
        )
        self.state = jax.device_put(state, replicated(self.mesh))
        return self.state

    def _load_pretrained(self, params, batch_stats):
        from simple_pose_tpu.convert.torch2flax import convert_torch_state, merge_converted

        path = self.cfg.model.pretrained
        family = "hrnet" if self.cfg.model.type == "pose_hrnet" else "resnet"
        import torch

        raw = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(raw, dict) and "ema" in raw:  # reference ckpt layout
            raw = raw["ema"]
        converted, _ = convert_torch_state(raw, family)
        merged, missing, unexpected = merge_converted(
            {"params": params, "batch_stats": batch_stats}, converted
        )
        if missing:
            print(f"pretrained: {len(missing)} missing keys (kept init)")
        if unexpected:
            print(f"pretrained: {len(unexpected)} unexpected keys (skipped)")
        return merged["params"], merged["batch_stats"]

    def _compile(self):
        if self._train_step is None:
            step_fn = make_train_step(self.train_model, self.tx, self.out_shape, self.crop_shape,
                                      amp=self.cfg.optim.amp, ema=self.cfg.optim.ema,
                                      encoding=self.cfg.data.encoding, mesh=self.mesh)
            self._train_step = jax.jit(step_fn, donate_argnums=0)
        if self._val_step is None:
            decoder = self.cfg.val.decoder or (
                "gauss_taylor" if self.cfg.model.type == "pose_hrnet" else "basic"
            )
            self._val_step = jax.jit(make_val_step(self.eval_model, decoder, self.out_shape, self.crop_shape))

    # -- loops -------------------------------------------------------------

    def train_epoch(self, epoch: int, log_every: int = 50):
        self._compile()
        t0 = time.time()
        # Metrics stay ON DEVICE between log points: a per-step float()
        # would block dispatch of step i+1 on step i's completion, inserting
        # a host-sync bubble every step (the reference pays the same tax via
        # loss.item(), dp_pose_resnet_solver.py:120).  We only materialize
        # at log_every boundaries and at epoch end, so the dispatch pipeline
        # stays full and the loop sustains the fused-program rate.
        pending = []  # device scalars, fetched lazily
        loss_sum, acc_sum, n = 0.0, 0.0, 0

        def drain():
            nonlocal loss_sum, acc_sum, n
            if pending:
                vals = np.asarray(jax.device_get(pending), np.float64)
                loss_sum += float(vals[:, 0].sum())
                acc_sum += float(vals[:, 1].sum())
                n += len(pending)
                pending.clear()

        # device_prefetch keeps one staged batch in flight so H2D overlaps
        # the previous step's compute
        for i, batch in enumerate(device_prefetch(self.train_pipe.epoch(epoch), self.mesh)):
            self.state, metrics = self._train_step(self.state, batch)
            pending.append(jnp.stack([metrics["loss"], metrics["acc"]]))
            if log_every and (i + 1) % log_every == 0:
                drain()
                dt = time.time() - t0
                print(
                    f"train epoch:{epoch + 1:3d}|iter:{i + 1:4d}|loss:{loss_sum / n:8.6f}"
                    f"|acc:{acc_sum / n * 100:6.4f}|{self.cfg.data.batch_size * n / dt:7.1f} crops/s"
                )
        drain()
        return {"loss": loss_sum / max(n, 1), "acc": acc_sum / max(n, 1)}

    _VAL_DEVICE_KEYS = ("canvas", "trans", "trans_inv", "joints")

    def validate(self, epoch: int, results_path: str = "temp_test.json"):
        self._compile()
        results = []
        multihost = jax.process_count() > 1
        loss_sum, acc_sum, n = 0.0, 0.0, 0

        # One-step software pipeline over a prefetched stream: dispatch the
        # val step for batch i+1 BEFORE materializing batch i's outputs, so
        # the host-side result fetch/decode overlaps device compute (the
        # train loop's deferred-sync discipline applied to eval; fixes the
        # unprefetched loop flagged in VERDICT round 2).
        def process(out, valid, img_ids):
            nonlocal loss_sum, acc_sum, n
            loss_sum += float(out["loss"])
            acc_sum += float(out["acc"])
            n += 1
            if multihost:
                # each host holds only its shard of the sharded outputs;
                # gather everything so every host can build the full result
                # list (the reference instead evals on rank 0 only,
                # ddp_pose_resnet_solver.py:153-155)
                from jax.experimental import multihost_utils as mhu
                from jax.sharding import PartitionSpec as P

                local = mhu.global_array_to_host_local_array(
                    {k: out[k] for k in ("kps", "kp_conf", "scores")}, self.mesh, P("data")
                )
                gathered = mhu.process_allgather(
                    {**jax.tree.map(np.asarray, local), "img_id": img_ids, "valid": valid},
                    tiled=True,
                )
                out = {"kps": gathered["kps"], "kp_conf": gathered["kp_conf"],
                       "scores": gathered["scores"]}
                img_ids = gathered["img_id"]
                valid = gathered["valid"]
            kps = np.asarray(out["kps"])
            conf = np.asarray(out["kp_conf"])
            scores = np.asarray(out["scores"])
            for b in range(kps.shape[0]):
                if valid[b] < 0.5:
                    continue
                results.append(
                    {
                        "image_id": int(img_ids[b]),
                        "category_id": 1,
                        "keypoints": np.concatenate([kps[b], conf[b]], -1).reshape(-1).tolist(),
                        "score": float(scores[b]),
                    }
                )

        pending = None
        for batch in device_prefetch(self.val_pipe.epoch(0), self.mesh,
                                     device_keys=self._VAL_DEVICE_KEYS):
            out = self._val_step(
                self.state, {k: batch[k] for k in self._VAL_DEVICE_KEYS if k in batch})
            if pending is not None:
                process(*pending)
            pending = (out, batch["valid"], batch["img_id"])
        if pending is not None:
            process(*pending)
        with open(results_path, "w") as wf:
            json.dump(results, wf)
        stats = evaluate_map(results_path, self.cfg.data.val_ann_path)
        print(
            f"eval epoch:{epoch + 1:d}|mean_loss:{loss_sum / max(n, 1):8.6f}"
            f"|mean_acc:{acc_sum / max(n, 1) * 100:6.4f}|val_ap:{stats['AP']:6.4f}"
        )
        return stats

    def save_checkpoint(self, epoch: int, val_ap: float):
        import orbax.checkpoint as ocp

        path = os.path.abspath(self.cfg.val.weight_path)
        os.makedirs(path, exist_ok=True)
        ckpt = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "ema_params": self.state.ema_params,
            "ema_batch_stats": self.state.ema_batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "epoch": epoch,
            "val_ap": val_ap,
        }
        with ocp.StandardCheckpointer() as ckptr:
            name = f"{self.cfg.model.type}_last"
            ckptr.save(os.path.join(path, name), ckpt, force=True)
            if val_ap > self.best_ap:
                self.best_ap = val_ap
                ckptr.save(os.path.join(path, f"{self.cfg.model.type}_best"), ckpt, force=True)

    def restore_checkpoint(self, name: Optional[str] = None):
        """Resume support (absent in the reference: run() always restarts)."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(self.cfg.val.weight_path)
        name = name or f"{self.cfg.model.type}_last"
        if self.state is None:
            self.init_state()
        template = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
            "ema_params": self.state.ema_params,
            "ema_batch_stats": self.state.ema_batch_stats,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
            "epoch": 0,
            "val_ap": 0.0,
        }
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(os.path.join(path, name), template)
        self.state = self.state.replace(
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            ema_params=restored["ema_params"],
            ema_batch_stats=restored["ema_batch_stats"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )
        self.best_ap = float(restored["val_ap"])
        return int(restored["epoch"]) + 1

    def run(self, resume: bool = False):
        start_epoch = 0
        if self.state is None:
            self.init_state()
        if resume:
            try:
                start_epoch = self.restore_checkpoint()
                print(f"resumed at epoch {start_epoch}")
            except FileNotFoundError:
                pass
        for epoch in range(start_epoch, self.cfg.optim.epochs):
            self.train_epoch(epoch)
            if (epoch + 1) % self.cfg.val.interval == 0:
                stats = self.validate(epoch)
                self.save_checkpoint(epoch, stats["AP"])


def _decay_mask(params):
    """Weight-decay only conv/linear kernels, not biases or norm scales
    (split_optimizer parity, commons/optims_utils.py:8-32)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: path[-1].key == "kernel", params
    )


def _group_labels(params):
    """split_params grouping (commons/optims_utils.py:8-18): biases,
    weight-decayed kernels, everything else (norm scales)."""
    def label(path, _):
        leaf = path[-1].key
        if leaf == "bias":
            return "bias"
        if leaf == "kernel":
            return "decay"
        return "other"

    return jax.tree_util.tree_map_with_path(label, params)
