"""Learning-rate schedules (optax-style step -> lr callables).

  * multistep_schedule: what the reference solvers actually use
    (torch MultiStepLR, dp_pose_resnet_solver.py:66-70): lr * gamma^k after
    each epoch milestone.
  * warmup_cosine_multistep_schedule: the reference's
    IterWarmUpCosineDecayMultiStepLRAdjust (commons/optims_utils.py:35-87):
    per-iter linear warmup, then per-milestone-segment cosine decay scaled
    by alpha^k, with the last segment flat.
  * epoch_warmup_cosine_schedule: EpochWarmUpCosineDecayLRAdjust
    (commons/optims_utils.py:90-129).

All schedules consume a global step count and a steps_per_epoch so they can
live inside the jitted update (pure functions of the step).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "multistep_schedule",
    "warmup_cosine_multistep_schedule",
    "epoch_warmup_cosine_schedule",
]


def multistep_schedule(init_lr, milestones_epochs, gamma, steps_per_epoch):
    boundaries = jnp.asarray([m * steps_per_epoch for m in sorted(milestones_epochs)])

    def schedule(step):
        k = jnp.sum(step >= boundaries)
        return init_lr * gamma**k

    return schedule


def _cosine(current, total, gamma, alpha):
    return ((1 + jnp.cos(current * jnp.pi / total)) / 2) ** gamma * (1 - alpha) + alpha


def warmup_cosine_multistep_schedule(init_lr, epochs, milestones, steps_per_epoch,
                                     warm_up_epoch=1, gamma=1.0, alpha=0.1,
                                     warmup_start=0.0):
    """warmup_start: warmup ramps from this ABSOLUTE lr to init_lr.  The
    reference warms the bias param group from 0.1 and everything else from 0
    (optims_utils.py:68-72: ``np.interp(it, [0, warm_up_iter], [0.1, lr])``);
    pass warmup_start=0.1 for the bias-group variant."""
    milestones = sorted(milestones or [])
    last_epoch = epochs + 1 if milestones and milestones[-1] == epochs else epochs
    flags = np.unique(np.asarray([warm_up_epoch] + milestones + [last_epoch], dtype=np.int64))
    flags_j = jnp.asarray(flags)
    warm_up_iter = warm_up_epoch * steps_per_epoch

    def schedule(step):
        epoch = step // steps_per_epoch
        ite = step % steps_per_epoch
        current_iter = step
        up_lr = jnp.interp(
            current_iter.astype(jnp.float32),
            jnp.asarray([0.0, float(max(warm_up_iter, 1))]),
            jnp.asarray([warmup_start, init_lr]),
        )
        num_pow = jnp.sum(flags_j <= epoch) - 1
        num_pow_c = jnp.clip(num_pow, 0, len(flags) - 2)
        seg_start = flags_j[num_pow_c]
        seg_end = flags_j[jnp.clip(num_pow_c + 1, 0, len(flags) - 1)]
        multi_step_w = alpha ** num_pow_c.astype(jnp.float32)
        cosine_ite = (epoch - seg_start) * steps_per_epoch + ite
        cosine_all = jnp.maximum((seg_end - seg_start) * steps_per_epoch, 1)
        cos_w = _cosine(cosine_ite.astype(jnp.float32), cosine_all.astype(jnp.float32), gamma, alpha)
        in_last_segment = num_pow == len(flags) - 2
        decay_lr = jnp.where(in_last_segment, multi_step_w * init_lr, multi_step_w * cos_w * init_lr)
        return jnp.where(epoch < warm_up_epoch, up_lr, decay_lr)

    return schedule


def epoch_warmup_cosine_schedule(init_lr, epochs, steps_per_epoch, warm_up_epoch=1, gamma=1.0,
                                 alpha=0.1, warmup_start=0.0):
    """warmup_start: see warmup_cosine_multistep_schedule (0.1 for the
    reference's bias group, optims_utils.py:113-117)."""
    warm_up_iter = warm_up_epoch * steps_per_epoch

    def schedule(step):
        epoch = step // steps_per_epoch
        up_lr = jnp.interp(
            step.astype(jnp.float32),
            jnp.asarray([0.0, float(max(warm_up_iter, 1))]),
            jnp.asarray([warmup_start, init_lr]),
        )
        cosine_ite = (epoch - warm_up_epoch + 1).astype(jnp.float32)
        cosine_all = float(max(epochs - warm_up_epoch, 1))
        cos_w = _cosine(cosine_ite, cosine_all, gamma, alpha)
        return jnp.where(epoch < warm_up_epoch, up_lr, cos_w * init_lr)

    return schedule
