"""Multi-host initialization (the DDP/NCCL-setup equivalent).

The reference's DDP path (ddp_pose_resnet_solver.py:33-48) needs explicit
process-group setup, per-rank device pinning and a DistributedSampler.  On
TPU pods the same program scales by calling ``init_multihost()`` once per
process: jax.distributed.initialize wires DCN, the Mesh spans all global
devices, and the data pipeline's (process_index, process_count) sharding
replaces the sampler (see data/pipeline.py).
"""

from __future__ import annotations

import jax

__all__ = ["init_multihost", "host_info"]


def init_multihost(coordinator_address=None, num_processes=None, process_id=None,
                   **kw):
    """Initialize JAX distributed.  On TPU pods all arguments are discovered
    from the environment; explicit args support manual clusters.  Extra
    kwargs forward to jax.distributed.initialize (e.g.
    shutdown_timeout_seconds for heavily time-skewed test hosts)."""
    kwargs = dict(kw)
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return host_info()


def host_info():
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
