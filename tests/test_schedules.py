"""LR schedules vs loop oracles (reference optims_utils semantics)."""

import math

import numpy as np
import jax.numpy as jnp

from simple_pose_tpu.train import schedules as S
from simple_pose_tpu.train.ema import ema_decay, ema_update


def test_multistep():
    sched = S.multistep_schedule(0.1, [2, 4], 0.1, steps_per_epoch=10)
    assert abs(float(sched(jnp.asarray(0))) - 0.1) < 1e-7
    assert abs(float(sched(jnp.asarray(19))) - 0.1) < 1e-7
    assert abs(float(sched(jnp.asarray(20))) - 0.01) < 1e-7
    assert abs(float(sched(jnp.asarray(39))) - 0.01) < 1e-7
    assert abs(float(sched(jnp.asarray(40))) - 0.001) < 1e-7


def _oracle_warmup_cosine_multistep(init_lr, epochs, milestones, iter_per_epoch,
                                    warm_up_epoch=1, gamma=1.0, alpha=0.1):
    """Loop oracle mirroring IterWarmUpCosineDecayMultiStepLRAdjust.get_lr
    (commons/optims_utils.py:63-81), up-branch lr."""
    milestones = sorted(milestones)
    last_epoch = epochs + 1 if milestones and milestones[-1] == epochs else epochs
    flag = np.unique(np.array([warm_up_epoch] + milestones + [last_epoch], dtype=np.int64))
    warm_up_iter = warm_up_epoch * iter_per_epoch

    def cosine(current, total):
        return ((1 + math.cos(current * math.pi / total)) / 2) ** gamma * (1 - alpha) + alpha

    def get_lr(ite, epoch):
        current_iter = iter_per_epoch * epoch + ite
        if epoch < warm_up_epoch:
            return np.interp(current_iter, [0, warm_up_iter], [0, init_lr])
        num_pow = (flag <= epoch).sum() - 1
        w = alpha**num_pow
        if num_pow == len(flag) - 2:
            return w * init_lr
        cosine_ite = (epoch - flag[num_pow]) * iter_per_epoch + ite
        cosine_all = (flag[num_pow + 1] - flag[num_pow]) * iter_per_epoch
        return w * cosine(cosine_ite, cosine_all) * init_lr

    return get_lr


def test_warmup_cosine_multistep_matches_oracle():
    spe = 7
    epochs, milestones = 10, [4, 7]
    sched = S.warmup_cosine_multistep_schedule(0.01, epochs, milestones, spe, warm_up_epoch=1)
    oracle = _oracle_warmup_cosine_multistep(0.01, epochs, milestones, spe, warm_up_epoch=1)
    for epoch in range(epochs):
        for ite in range(spe):
            step = epoch * spe + ite
            got = float(sched(jnp.asarray(step)))
            ref = float(oracle(ite, epoch))
            assert abs(got - ref) < 1e-6, (epoch, ite, got, ref)


def test_bias_warmup_ramp_matches_oracle():
    """The bias group warms from ABSOLUTE lr 0.1 (optims_utils.py:68-72:
    down_lr = interp(it, [0, warm_up_iter], [0.1, lr])); outside warmup both
    groups are identical."""
    spe = 7
    epochs, milestones = 10, [4, 7]
    up = S.warmup_cosine_multistep_schedule(0.01, epochs, milestones, spe, warm_up_epoch=1)
    down = S.warmup_cosine_multistep_schedule(0.01, epochs, milestones, spe, warm_up_epoch=1,
                                              warmup_start=0.1)
    for epoch in range(epochs):
        for ite in range(spe):
            step = epoch * spe + ite
            got = float(down(jnp.asarray(step)))
            if epoch < 1:
                ref = float(np.interp(step, [0, spe], [0.1, 0.01]))
                assert abs(got - ref) < 1e-6, (epoch, ite, got, ref)
            else:
                assert abs(got - float(up(jnp.asarray(step)))) < 1e-7


def test_ema_ramp():
    assert float(ema_decay(jnp.asarray(0.0))) == 0.0
    d1 = float(ema_decay(jnp.asarray(1.0)))
    assert abs(d1 - 0.9999 * (1 - math.exp(-1 / 2000))) < 1e-6
    d_inf = float(ema_decay(jnp.asarray(1e9)))
    assert abs(d_inf - 0.9999) < 1e-6


def test_ema_update_moves_toward_new():
    ema = {"w": jnp.asarray([1.0, 1.0])}
    new = {"w": jnp.asarray([2.0, 0.0])}
    out = ema_update(ema, new, updates=2000)
    d = float(ema_decay(jnp.asarray(2000.0)))
    np.testing.assert_allclose(np.asarray(out["w"]), [d * 1 + (1 - d) * 2, d * 1], rtol=1e-6)
