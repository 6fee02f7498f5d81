"""Host input pipeline: decode + tiny matrix math only; everything heavy
(crop, augment, target encoding, normalization) runs on-device.

Replaces the reference's DataLoader workers + cv2 transform pipeline
(commons/transforms.py RefineSimpleTransform + datasets/coco.py collate_fn
+ DistributedSampler).  Per sample the host:

  1. decodes the JPEG and pastes it (RGB) into a fixed uint8 canvas at the
     origin -- NO interpolation on host, so the device bilinear crop is the
     single resample, exactly like cv2.warpAffine on the original image
     (zero padding beyond the true image equals BORDER_CONSTANT 0);
  2. draws augmentation params (DPG box jitter, scale 0.7-1.3, rot +-40,
     p=0.5 horizontal flip) from a seeded numpy Generator and composes them
     into two 2x3 affines (crop matrix, output-space matrix): the image flip
     is folded into the matrices via hflip_affine, so the host never touches
     pixels;
  3. transforms joints into heatmap space (affine_transform_batch parity).

A batch is {canvas u8 [B,S,S,3], trans f32 [B,2,3], joints f32 [B,17,3],
trans_inv f32 [B,2,3], img_id i64 [B], area/score f32 [B] (det-box eval)}.
Decoding runs in a thread pool (cv2 releases the GIL) with a prefetch queue;
per-host sharding replaces DistributedSampler (each process takes a
contiguous stride of the epoch permutation).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional, Sequence

import numpy as np

from simple_pose_tpu.data.coco import DetBoxRecord, PoseRecord, JOINT_PAIRS
from simple_pose_tpu.ops import affine as A

__all__ = ["PosePipeline", "DetBoxPipeline", "RGB_MEAN"]

# normalization parity quirk: mean subtract only, NO std divide
# (datasets/coco.py:134-136)
RGB_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)


def _imread_rgb(path):
    import cv2 as cv

    cv.setNumThreads(0)
    img = cv.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img[..., ::-1]  # BGR -> RGB


class _SampleTransform:
    """Geometry for one sample: reproduces RefineSimpleTransform.__call__
    (commons/transforms.py:193-223) with the image flip/warp folded into
    matrices."""

    def __init__(self, input_shape=(192, 256), output_shape=(48, 64),
                 scale=(0.7, 1.3), rot=(-40, 40), rand_crop=True, flip=True):
        self.input_shape = input_shape
        self.output_shape = output_shape
        self.w_h_ratio = input_shape[0] / input_shape[1]
        self.scale = scale
        self.rot = rot
        self.rand_crop = rand_crop
        self.flip = flip

    def __call__(self, rec: PoseRecord, rng: np.random.Generator, augment: bool):
        joints = rec.joints.copy()
        bbox = list(rec.box)
        if augment and self.rand_crop:
            bbox = A.box_jitter(bbox, rec.width, rec.height, rng)
        x1, y1, x2, y2 = bbox
        center, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, self.w_h_ratio)
        if augment:
            scale = scale * rng.uniform(self.scale[0], self.scale[1])
            rot = rng.uniform(self.rot[0], self.rot[1])
        else:
            rot = 0.0
        flipped = augment and self.flip and rng.uniform() < 0.5
        if flipped:
            joints = A.flip_joints(joints, rec.width, JOINT_PAIRS)
            center = center.copy()
            center[0] = rec.width - center[0] - 1

        img_trans, _ = A.get_affine_transform(center, scale, rot, self.input_shape)
        out_trans, out_trans_inv = A.get_affine_transform(center, scale, rot, self.output_shape)
        if flipped:
            # fold np.fliplr into the sampling matrices (image stays unflipped)
            f = A.hflip_affine(rec.width)
            img_trans = A.compose_affine(img_trans, f)
        joints_out = A.affine_transform_joints(joints, out_trans)
        return (
            img_trans.astype(np.float32),
            joints_out.astype(np.float32),
            np.asarray(out_trans_inv, dtype=np.float32),
        )


class _Prefetcher:
    """Thread-pool batch producer with a bounded prefetch window.

    Workers may run at most ``prefetch`` batches ahead of the consumer
    (bounding host memory at prefetch x batch bytes); a worker exception is
    captured and re-raised at the consumer instead of hanging it."""

    def __init__(self, make_batch, num_batches, num_threads=8, prefetch=4):
        self._make_batch = make_batch
        self._num = num_batches
        self._threads = max(1, num_threads)
        self._prefetch = max(1, prefetch)

    def __iter__(self):
        indices = queue.Queue()
        for i in range(self._num):
            indices.put(i)
        results = {}
        lock = threading.Lock()
        cond = threading.Condition(lock)
        window = threading.Semaphore(self._prefetch)
        consumed = threading.Event()

        def worker():
            while True:
                window.acquire()
                if consumed.is_set():
                    return
                try:
                    i = indices.get_nowait()
                except queue.Empty:
                    return
                try:
                    b = self._make_batch(i)
                except BaseException as e:  # propagate to the consumer
                    b = e
                with cond:
                    results[i] = b
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True) for _ in range(self._threads)]
        for t in threads:
            t.start()
        try:
            for i in range(self._num):
                with cond:
                    while i not in results:
                        cond.wait()
                    b = results.pop(i)
                window.release()
                if isinstance(b, BaseException):
                    raise b
                yield b
        finally:
            consumed.set()
            for _ in threads:
                window.release()


class PosePipeline:
    """Training/val batches from PoseRecords.

    :param canvas: fixed square canvas edge (COCO images are <= 640)
    :param per_host: if True, shard the epoch across jax processes
    """

    def __init__(self, records: Sequence[PoseRecord], batch_size: int,
                 input_shape=(192, 256), output_shape=(48, 64), canvas: int = 640,
                 augment: bool = True, shuffle: bool = True, seed: int = 1024,
                 num_threads: int = 8, prefetch: int = 4,
                 process_index: int = 0, process_count: int = 1,
                 drop_last: bool = True, use_native: Optional[bool] = None,
                 dedup_canvases: int = 0, dedup_buckets: int = 1,
                 aug_scale=(0.7, 1.3), aug_rot=(-40, 40), aug_flip=True):
        self.records = list(records)
        self.batch_size = batch_size
        self.canvas = canvas
        self.augment = augment
        self.shuffle = shuffle
        self.seed = seed
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.transform = _SampleTransform(input_shape=input_shape, output_shape=output_shape,
                                          scale=tuple(aug_scale), rot=tuple(aug_rot),
                                          flip=bool(aug_flip))
        self.num_joints = self.records[0].joints.shape[0] if self.records else 17
        # canvas dedup: COCO averages ~2.3 instances/image, so shipping one
        # canvas per CROP wastes ~2x host decode + H2D.  dedup_canvases = U
        # canvas slots per batch (0 = off); crops stay at batch_size.  Slots
        # and crops are packed per device bucket (dedup_buckets = data-axis
        # size) so the on-device canvas gather is bucket-LOCAL ("canvas_idx"
        # holds bucket-local slot indices) and needs no cross-device traffic.
        self.dedup_canvases = int(dedup_canvases)
        self.dedup_buckets = max(1, int(dedup_buckets))
        if self.dedup_canvases:
            assert batch_size % self.dedup_buckets == 0, (batch_size, dedup_buckets)
            assert self.dedup_canvases % self.dedup_buckets == 0, (dedup_canvases, dedup_buckets)
        # native batch JPEG decoder (C++ thread pool); None = auto-detect.
        # Only .jpg/.jpeg go native; anything else falls back to cv2.
        self._native = None
        if use_native is not False:
            from simple_pose_tpu.data import native as _native_mod

            if _native_mod.native_available():
                self._native = _native_mod.NativeCanvasLoader(num_threads)
            elif use_native:
                raise RuntimeError("native loader requested but unavailable")

    def _epoch_order(self, epoch: int) -> np.ndarray:
        return self._epoch_order_for(epoch, self.process_index)

    def batches_per_epoch(self) -> int:
        # every host must produce the SAME number of batches (they
        # participate in the same collectives): size off the global record
        # count, not this host's shard (which can differ by one)
        if self.drop_last:
            n_min = len(self.records) // self.process_count
            return n_min // self.batch_size
        n_max = -(-len(self.records) // self.process_count)
        return -(-n_max // self.batch_size)

    def _geometry(self, rec: PoseRecord, rng: np.random.Generator):
        return self.transform(rec, rng, self.augment)

    # per-record scalar extras added to dedup batches (DetBoxPipeline:
    # area/score); keys must be listed in ``extra_keys``
    extra_keys: tuple = ()

    def _extra_fields(self, ridx: int) -> dict:
        return {}

    # -- canvas dedup packing ------------------------------------------------

    def _pack_epoch(self, epoch: int, process_index: Optional[int] = None):
        """Greedy per-bucket packing plan (pure index math, no IO).

        Returns a list of batch plans; each plan is a list of dedup_buckets
        buckets, each bucket = (canvas_paths, crops) with crops a list of
        (local_canvas_slot, record_idx | None).  None = padded crop slot
        (canvas slots ran out on a run of single-instance images); padded
        crops carry zero joints so the loss mask drops them.
        """
        order = self._epoch_order(epoch) if process_index is None else (
            self._epoch_order_for(epoch, process_index))
        # instance groups by source image, ordered by first appearance
        by_img: dict = {}
        for ridx in order:
            by_img.setdefault(self.records[int(ridx)].img_path, []).append(int(ridx))
        groups = [(path, insts) for path, insts in by_img.items()]
        n = self.dedup_buckets
        cap_crops = self.batch_size // n
        cap_canv = self.dedup_canvases // n
        plans = []
        gi = 0
        carry = None  # remainder of a split group: (path, insts)
        while True:
            plan = []
            exhausted = False
            for _ in range(n):
                canv, crops = [], []
                while len(crops) < cap_crops:
                    if carry is not None:
                        path, insts = carry
                        carry = None
                    elif gi < len(groups):
                        path, insts = groups[gi]
                        gi += 1
                    else:
                        exhausted = True
                        break
                    if len(canv) == cap_canv:
                        carry = (path, insts)  # no slot left; bucket pads
                        break
                    room = cap_crops - len(crops)
                    take, rest = insts[:room], insts[room:]
                    ci = len(canv)
                    canv.append(path)
                    crops.extend((ci, r) for r in take)
                    if rest:  # image spills into the next bucket/batch
                        carry = (path, rest)
                        break
                while len(crops) < cap_crops:  # pad (valid=0, masked loss)
                    crops.append((0, None))
                plan.append((canv, crops))
            if exhausted and self.drop_last:
                break
            plans.append(plan)
            if exhausted or (gi >= len(groups) and carry is None):
                break
        return plans

    def _epoch_order_for(self, epoch: int, process_index: int) -> np.ndarray:
        n = len(self.records)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(self.seed + epoch).permutation(n)
        return order[process_index::self.process_count]

    def dedup_batches_per_epoch(self, epoch: int) -> int:
        """Packed batch count, equalized across hosts (every host packs every
        host's plan -- cheap index math -- and takes the min, so collectives
        can't deadlock on a skewed instance distribution)."""
        return min(
            len(self._pack_epoch(epoch, process_index=h)) for h in range(self.process_count)
        )

    def _dedup_epoch(self, epoch: int) -> Iterator[dict]:
        plans = self._pack_epoch(epoch)
        nb = self.dedup_batches_per_epoch(epoch) if self.process_count > 1 else len(plans)
        n = self.dedup_buckets
        cap_canv = self.dedup_canvases // n
        bs, U = self.batch_size, self.dedup_canvases

        def make_batch(bi):
            plan = plans[bi]
            canvases = np.zeros((U, self.canvas, self.canvas, 3), dtype=np.uint8)
            canvas_idx = np.zeros((bs,), dtype=np.int32)
            trans = np.zeros((bs, 2, 3), dtype=np.float32)
            joints = np.zeros((bs, self.num_joints, 3), dtype=np.float32)
            trans_inv = np.zeros((bs, 2, 3), dtype=np.float32)
            img_ids = np.zeros((bs,), dtype=np.int64)
            valid = np.zeros((bs,), dtype=np.float32)
            extras = {key: np.zeros((bs,), dtype=np.float32) for key in self.extra_keys}
            k = 0
            for b, (canv, crops) in enumerate(plan):
                paths_native = self._native is not None and all(
                    p.lower().endswith((".jpg", ".jpeg")) for p in canv
                )
                if paths_native and canv:
                    loaded, _, _ = self._native.load_batch(canv, self.canvas)
                    canvases[b * cap_canv:b * cap_canv + len(canv)] = loaded
                else:
                    for ci, path in enumerate(canv):
                        img = _imread_rgb(path)
                        h, w = img.shape[:2]
                        ch, cw = min(h, self.canvas), min(w, self.canvas)
                        canvases[b * cap_canv + ci, :ch, :cw] = img[:ch, :cw]
                for ci, ridx in crops:
                    canvas_idx[k] = ci  # bucket-LOCAL slot index
                    if ridx is not None:
                        rec = self.records[ridx]
                        rng = np.random.default_rng((self.seed, epoch, int(ridx)))
                        trans[k], joints[k], trans_inv[k] = self._geometry(rec, rng)
                        img_ids[k] = rec.img_id
                        valid[k] = 1.0
                        for key, val in self._extra_fields(ridx).items():
                            extras[key][k] = val
                    else:  # padded slot: identity-ish crop, zero joints
                        trans[k] = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
                        trans_inv[k] = np.array([[1, 0, 0], [0, 1, 0]], np.float32)
                    k += 1
            return {
                "canvas": canvases, "canvas_idx": canvas_idx, "trans": trans,
                "joints": joints, "trans_inv": trans_inv, "img_id": img_ids,
                "valid": valid, **extras,
            }

        return iter(_Prefetcher(make_batch, nb, self.num_threads, self.prefetch))

    def _load_sample(self, rec: PoseRecord, rng: np.random.Generator):
        img = _imread_rgb(rec.img_path)
        h, w = img.shape[:2]
        canvas = np.zeros((self.canvas, self.canvas, 3), dtype=np.uint8)
        ch, cw = min(h, self.canvas), min(w, self.canvas)
        canvas[:ch, :cw] = img[:ch, :cw]
        trans, joints_out, trans_inv = self._geometry(rec, rng)
        return canvas, trans, joints_out, trans_inv

    def epoch(self, epoch: int = 0) -> Iterator[dict]:
        if self.dedup_canvases:
            return self._dedup_epoch(epoch)
        order = self._epoch_order(epoch)
        bs = self.batch_size
        nb = self.batches_per_epoch()

        def make_batch(bi):
            idxs = order[bi * bs:(bi + 1) * bs]
            real = len(idxs)
            if real < bs:  # pad to fixed shape; mask via 'valid'
                filler = idxs[-1:] if real else (order[-1:] if len(order) else np.array([0]))
                idxs = np.concatenate([idxs, np.repeat(filler, bs - real)])
            recs = [self.records[r] for r in idxs]
            trans = np.zeros((bs, 2, 3), dtype=np.float32)
            joints = np.zeros((bs, self.num_joints, 3), dtype=np.float32)
            trans_inv = np.zeros((bs, 2, 3), dtype=np.float32)
            img_ids = np.zeros((bs,), dtype=np.int64)
            valid = np.zeros((bs,), dtype=np.float32)
            native_ok = self._native is not None and all(
                r.img_path.lower().endswith((".jpg", ".jpeg")) for r in recs
            )
            if native_ok:
                canvases, _, _ = self._native.load_batch([r.img_path for r in recs], self.canvas)
            else:
                canvases = np.zeros((bs, self.canvas, self.canvas, 3), dtype=np.uint8)
            for k, (ridx, rec) in enumerate(zip(idxs, recs)):
                rng = np.random.default_rng((self.seed, epoch, int(ridx)))
                if native_ok:
                    trans[k], joints[k], trans_inv[k] = self._geometry(rec, rng)
                else:
                    canvases[k], trans[k], joints[k], trans_inv[k] = self._load_sample(rec, rng)
                img_ids[k] = rec.img_id
                valid[k] = 1.0 if k < real else 0.0
            return {
                "canvas": canvases, "trans": trans, "joints": joints,
                "trans_inv": trans_inv, "img_id": img_ids, "valid": valid,
            }

        return iter(_Prefetcher(make_batch, nb, self.num_threads, self.prefetch))


class DetBoxPipeline(PosePipeline):
    """Eval batches from detector boxes (datasets/naive_data.py BasicTransform:
    identity augmentation, plus per-instance area = scale_w * scale_h and the
    detector score)."""

    def __init__(self, records: Sequence[DetBoxRecord], batch_size: int, **kw):
        kw.setdefault("augment", False)
        kw.setdefault("shuffle", False)
        kw.setdefault("drop_last", False)
        pose_records = [
            PoseRecord(r.img_path, 0, 0, r.box, np.zeros((17, 3), np.float32), r.img_id) for r in records
        ]
        super().__init__(pose_records, batch_size, **kw)
        self.det_records = list(records)

    extra_keys = ("area", "score")

    def _geometry(self, rec: PoseRecord, rng):
        x1, y1, x2, y2 = rec.box
        center, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, self.transform.w_h_ratio)
        trans, _ = A.get_affine_transform(center, scale, 0, self.transform.input_shape)
        _, trans_inv = A.get_affine_transform(center, scale, 0, self.transform.output_shape)
        joints = np.zeros((self.num_joints, 3), dtype=np.float32)
        return trans.astype(np.float32), joints, np.asarray(trans_inv, np.float32)

    def _extra_fields(self, ridx: int) -> dict:
        r = self.det_records[int(ridx)]
        x1, y1, x2, y2 = r.box
        _, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, self.transform.w_h_ratio)
        return {"area": scale[0] * scale[1], "score": r.score}

    def epoch(self, epoch: int = 0):
        if self.dedup_canvases:  # extras flow through _extra_fields instead
            return self._dedup_epoch(epoch)
        return self._detbox_epoch(epoch)

    def _detbox_epoch(self, epoch: int):
        # mirror the parent's batching of the per-host epoch order exactly so
        # area/score stay aligned with the crops under sharding or shuffling
        order = self._epoch_order(epoch)
        bs = self.batch_size
        for bi, batch in enumerate(super().epoch(epoch)):
            idxs = order[bi * bs:(bi + 1) * bs]
            if len(idxs) < bs:
                filler = idxs[-1:] if len(idxs) else (order[-1:] if len(order) else np.array([0]))
                idxs = np.concatenate([idxs, np.repeat(filler, bs - len(idxs))])
            areas = np.zeros((bs,), dtype=np.float32)
            scores = np.zeros((bs,), dtype=np.float32)
            for k, ridx in enumerate(idxs):
                r = self.det_records[int(ridx)]
                x1, y1, x2, y2 = r.box
                _, scale = A.box_to_center_scale(x1, y1, x2 - x1, y2 - y1, self.transform.w_h_ratio)
                areas[k] = scale[0] * scale[1]
                scores[k] = r.score
            batch["joints"][:] = 0.0
            batch["area"] = areas
            batch["score"] = scores
            yield batch
