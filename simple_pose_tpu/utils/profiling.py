"""Profiling / timing harness (aux subsystem the reference lacks;
SURVEY.md section 5).

  * timed(): robust wall-clock timing of jitted callables with a host-side
    sync (block_until_ready can return early on tunneled TPU platforms --
    observed on axon -- so synchronization forces a scalar device->host
    transfer).
  * trace(): context manager around jax.profiler for TensorBoard traces.
  * crops_per_sec(): the north-star metric helper.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp

__all__ = ["sync", "timed", "trace", "crops_per_sec"]


def sync(tree):
    """Force completion of everything `tree` depends on."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        float(jnp.sum(jnp.abs(leaves[0]).astype(jnp.float32)))
    return tree


def timed(fn, *args, iters: int = 10, warmup: int = 3):
    """Returns (mean seconds per call, last result)."""
    result = None
    for _ in range(warmup):
        result = sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args)
    sync(result)
    return (time.perf_counter() - t0) / iters, result


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def crops_per_sec(step_fn, state, batch, batch_size: int, iters: int = 10):
    """Train-loop throughput: chained steps, single sync at the end."""
    state, metrics = step_fn(state, batch)
    sync(metrics)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step_fn(state, batch)
    sync(metrics)
    dt = time.perf_counter() - t0
    return batch_size * iters / dt, state
