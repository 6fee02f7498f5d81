"""Small training utilities (commons/model_utils.py equivalents).

The torch-specific pieces of the reference have no TPU analogue and are
intentionally absent: convert_weights lives in convert/torch2flax.py
(module-prefix stripping), is_parallel/freeze_bn are meaningless for
functional flax models (BN freezing = passing train=False / not updating
batch_stats), reduce_sum is jax.lax.psum inside pjit.
"""

from __future__ import annotations

import os
import random

import numpy as np

__all__ = ["rand_seed", "AverageLogger"]


def rand_seed(seed: int = 888):
    """Seed python/numpy RNGs (commons/model_utils.py:9-17).  Device-side
    determinism in JAX comes from explicit PRNG keys, so there is no cudnn
    flag equivalent; XLA is deterministic by default for this workload."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return seed


class AverageLogger:
    """Running sum/mean logger (commons/model_utils.py:93-113)."""

    def __init__(self):
        self.data = 0.0
        self.count = 0.0

    def update(self, data, count=None):
        self.data += data
        self.count += count if count is not None else 1

    def avg(self):
        return self.data / self.count

    def sum(self):
        return self.data

    def reset(self):
        self.data = 0.0
        self.count = 0.0
