"""Device mesh + sharding helpers.

One SPMD program replaces the reference's three parallel code paths
(nn.DataParallel, DistributedDataParallel+NCCL, SyncBatchNorm): the batch
axis is sharded over a ``data`` mesh axis; XLA inserts the gradient psum and
the BatchNorm statistics reductions over ICI automatically.  A second
``model`` axis is reserved so tensor/branch-parallel shardings can be layered
in without restructuring (SURVEY.md section 2: parallelism plan).

Multi-host: call jax.distributed.initialize() before make_mesh; each process
feeds only its addressable shard of the batch
(jax.make_array_from_process_local_data).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch", "device_prefetch",
           "bucketed_gather_crop"]


def make_mesh(mesh_spec: Optional[dict] = None, devices=None) -> Mesh:
    """:param mesh_spec: {'data': n} / {'data': n, 'model': m}; -1 = fill."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    spec = dict(mesh_spec or {"data": -1})
    sizes = list(spec.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1])) or 1
        fill = len(devices) // known
        sizes = [s if s != -1 else fill for s in sizes]
    total = int(np.prod(sizes))
    return Mesh(devices[:total].reshape(sizes), tuple(spec.keys()))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 over the data axis; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch dict onto the mesh, dim-0 sharded.

    Single-process: device_put with a NamedSharding.  Multi-host: each
    process contributes its local shard."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        # values that are already global jax.Arrays (e.g. pre-staged by
        # device_prefetch) pass through: re-wrapping a non-addressable array
        # as process-local data is an error
        return {
            k: v if (isinstance(v, jax.Array) and not isinstance(v, np.ndarray))
            else jax.make_array_from_process_local_data(sharding, np.asarray(v))
            for k, v in batch.items()
        }
    return jax.device_put(batch, sharding)


def bucketed_gather_crop(crop_fn, mesh: Mesh, axis: str = "data"):
    """shard_map'd (canvas, trans, idx) -> crops for canvas-dedup batches.

    The pipeline packs crops and their source canvases into per-device
    buckets with bucket-LOCAL slot indices, so each device gathers only from
    its own canvas shard -- dedup adds zero cross-device traffic.  Shared by
    the train step and the mesh-sharded eval workflows."""
    def local_gather_crop(canvas, trans, idx):
        return crop_fn(canvas[idx], trans)

    specs = dict(in_specs=(P(axis), P(axis), P(axis)), out_specs=P(axis))
    try:
        from jax import shard_map

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, which the default check rejects (the gather+crop is
        # trivially per-shard -- nothing is replicated)
        return shard_map(local_gather_crop, mesh=mesh, check_vma=False, **specs)
    except (ImportError, TypeError):  # older jax (no jax.shard_map, or a
        # version whose shard_map still spells the flag check_rep)
        from jax.experimental.shard_map import shard_map

        return shard_map(local_gather_crop, mesh=mesh, check_rep=False, **specs)


def host_prefetch(batches, device_keys=("canvas", "canvas_idx", "trans", "trans_inv"),
                  depth: int = 2):
    """Single-device variant of device_prefetch: asynchronously device_put
    the device-consumed keys of each batch ``depth`` ahead, so the H2D
    transfer of batch i+1 overlaps the device step on batch i.  Host-side
    keys (img_id, valid, score, ...) pass through untouched."""
    import jax
    from collections import deque

    buf = deque()
    for b in batches:
        staged = {k: (jax.device_put(v) if k in device_keys else v) for k, v in b.items()}
        buf.append(staged)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()


def device_prefetch(batches, mesh: Mesh, depth: int = 2, axis: str = "data",
                    device_keys=None):
    """Double-buffered host->device staging: keep ``depth`` batches in
    flight so the (asynchronous) device_put transfer of batch i+1 overlaps
    the device step consuming batch i -- the replacement for the
    DataLoader's pin_memory + non_blocking copy idiom.

    device_keys: if given, only these keys are staged/sharded; the rest
    (host-side metadata like img_id/valid) pass through as numpy."""
    from collections import deque

    buf = deque()
    for b in batches:
        if device_keys is None:
            staged = shard_batch(b, mesh, axis)
        else:
            staged = dict(b)
            staged.update(shard_batch(
                {k: b[k] for k in device_keys if k in b}, mesh, axis))
        buf.append(staged)
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
