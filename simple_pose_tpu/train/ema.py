"""Exponential moving average of the model variables as a pytree op.

Parity with ModelEMA (commons/model_utils.py:49-83): ramped decay
d = base_decay * (1 - exp(-updates / 2000)); ema <- d * ema + (1 - d) * new,
applied to parameters AND batch-norm statistics (the reference averages the
full state_dict including buffers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["ema_decay", "ema_update"]


def ema_decay(updates, base_decay=0.9999):
    return base_decay * (1.0 - jnp.exp(-updates / 2000.0))


def ema_update(ema_tree, new_tree, updates, base_decay=0.9999):
    """:param updates: the post-increment update counter (float or int).

    Deliberately per-leaf: inside the fused train step XLA schedules the
    per-tensor lerps at ~zero overhead, and a raveled-vector variant
    measured 4.5% SLOWER end to end (the ravel/unravel copies are real,
    the "kernel launches" are not -- scripts/probe_deconv.py round 2)."""
    d = ema_decay(jnp.asarray(updates, jnp.float32), base_decay)
    return jax.tree.map(lambda e, n: d * e + (1.0 - d) * n.astype(e.dtype), ema_tree, new_tree)
