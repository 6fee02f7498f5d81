"""Round-2b perf probes on real hardware (run over the TPU tunnel, nohup).

Three hypotheses, each timed as an isolated long-averaged loop (per
docs/PERF.md: never trust isolated SMALL programs over the tunnel; these are
full-model programs, which are trustworthy):

  1. BN-fold ceiling: eval forward with BatchNorm removed from the graph
     entirely vs the normal inference BN.  If the gap is big, implement a
     conv<-BN folding transform (convert/fold_bn.py); if ~0, XLA already
     fuses inference BN into conv epilogues and folding is pointless.
  2. Space-to-depth stem: conv7x7s2 on [B,256,192,3] vs the exact
     reformulation conv4x4s1 on [B,128,96,12] (MLPerf ResNet trick) --
     measures whether XLA:TPU already handles the 3-channel stem well.
  3. Larger batch: fwd+bwd at batch 256 vs 128 (MFU vs memory).

Prints one JSON line per measurement.
"""

import json
import os
import sys
import time
from contextlib import contextmanager
from unittest import mock

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps=20, warmup=3):
    import jax
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.perf_counter() - t0) / steps


@contextmanager
def bn_removed():
    """Replace every batch_norm with an identity module (probe only)."""
    import flax.linen as nn

    class _Identity(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x

    import simple_pose_tpu.models.layers as L

    with mock.patch.object(L, "batch_norm", lambda *a, **k: _Identity(name=k.get("name"))):
        # the model modules import batch_norm by name at module import time;
        # patch those references too
        import simple_pose_tpu.models.hrnet as H
        import simple_pose_tpu.models.resnet as R

        with mock.patch.object(R, "batch_norm", L.batch_norm), \
                mock.patch.object(H, "batch_norm", L.batch_norm):
            yield


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from simple_pose_tpu.models import build_model

    rng = np.random.default_rng(0)
    batch = int(os.environ.get("PROBE_BATCH", 128))
    crop_shape = (256, 192)
    x = jax.device_put(rng.normal(0, 1, (batch,) + crop_shape + (3,)).astype(np.float32)
                       .astype(jnp.bfloat16))

    # ---- probe 1: BN-fold ceiling (eval forward) ----
    for mtype, mname, kw in (("pose_resnet_dconv", "resnet50", {"reduction": True}),
                             ("pose_hrnet", "w32", {})):
        model = build_model(mtype, mname, num_joints=17, train=False, dtype="bfloat16", **kw)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1,) + crop_shape + (3,), jnp.float32))
        fwd = jax.jit(lambda vv, xx, m=model: m.apply(vv, xx))
        t = timed(fwd, (v, x))
        emit(probe="eval_fwd_bn", model=f"{mtype}:{mname}", ms=round(t * 1000, 3),
             crops_per_sec=round(batch / t, 1))

        with bn_removed():
            model_nb = build_model(mtype, mname, num_joints=17, train=False,
                                   dtype="bfloat16", **kw)
            v_nb = model_nb.init(jax.random.PRNGKey(0),
                                 jnp.zeros((1,) + crop_shape + (3,), jnp.float32))
            fwd_nb = jax.jit(lambda vv, xx, m=model_nb: m.apply(vv, xx))
            t2 = timed(fwd_nb, (v_nb, x))
        emit(probe="eval_fwd_nobn", model=f"{mtype}:{mname}", ms=round(t2 * 1000, 3),
             crops_per_sec=round(batch / t2, 1), speedup_vs_bn=round(t / t2, 3))

    # ---- probe 2: space-to-depth stem ----
    from jax import lax

    w7 = rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32)
    xs = rng.normal(0, 1, (batch, 256, 192, 3)).astype(np.float32)

    def stem_direct(xx, ww):
        dn = lax.conv_dimension_numbers(xx.shape, ww.shape, ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(xx, ww, (2, 2), [(3, 3), (3, 3)],
                                        dimension_numbers=dn,
                                        preferred_element_type=jnp.float32)

    # exact space-to-depth reformulation: pad x to 8x8 kernel support, split
    # into 2x2 phases -> channels, conv 4x4 stride 1 with phase-rearranged
    # kernel.  y[p,q] = sum_{i,j} x[2p+i-3, 2q+j-3] w[i,j]
    # with i=2a+di, j=2b+dj (di,dj in {0,1}): shift x by parity, kernel 4x4.
    def stem_s2d(xx, ww):
        # pad so that every (di,dj) phase slice is aligned
        xp = jnp.pad(xx, ((0, 0), (3, 4), (3, 4), (0, 0)))
        # phases: xp[:, di::2, dj::2, :] has shape [B, 130ish, ...]
        phases = [xp[:, di::2, dj::2, :] for di in (0, 1) for dj in (0, 1)]
        H = min(p.shape[1] for p in phases)
        W = min(p.shape[2] for p in phases)
        xd = jnp.concatenate([p[:, :H, :W, :] for p in phases], axis=-1)  # [B,H,W,12]
        # kernel: w[2a+di, 2b+dj, c, o] -> wd[a, b, (di,dj,c), o], a,b in 0..3
        wp = jnp.pad(ww, ((0, 1), (0, 1), (0, 0), (0, 0)))  # 8x8
        wd = jnp.concatenate([wp[di::2, dj::2, :, :] for di in (0, 1) for dj in (0, 1)],
                             axis=2)  # [4,4,12,64]
        dn = lax.conv_dimension_numbers(xd.shape, wd.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(xd, wd, (1, 1), [(0, 0), (0, 0)],
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
        return y[:, :128, :96, :]

    # exactness check on small input (CPU-fallback-safe: runs on device too)
    y1 = np.asarray(stem_direct(jnp.asarray(xs[:2]), jnp.asarray(w7)))[:, :128, :96, :]
    y2 = np.asarray(stem_s2d(jnp.asarray(xs[:2]), jnp.asarray(w7)))
    err = float(np.abs(y1 - y2).max())
    emit(probe="s2d_exactness", max_abs_err=err)

    xd_dev = jax.device_put(xs.astype(jnp.bfloat16))
    w_dev = jax.device_put(w7.astype(jnp.bfloat16))
    t_direct = timed(jax.jit(stem_direct), (xd_dev, w_dev), steps=50, warmup=5)
    t_s2d = timed(jax.jit(stem_s2d), (xd_dev, w_dev), steps=50, warmup=5)
    emit(probe="stem_7x7_direct", ms=round(t_direct * 1000, 3))
    emit(probe="stem_s2d", ms=round(t_s2d * 1000, 3), speedup=round(t_direct / t_s2d, 3))


if __name__ == "__main__":
    main()
