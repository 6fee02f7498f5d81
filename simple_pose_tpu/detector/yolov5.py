"""YOLOv5 person detector (flax, NHWC) -- re-implementation of
detector/nets/yolov5.py as a jitted graph.

The head decode (sigmoid; xy = (2s - 0.5 + grid) * stride;
wh = (2s)^2 * anchor; concat levels -> [B, sum(A), 5 + nc]) runs inside jit
with static grids (yolov5.py:135-151).  Conv+BN fusion (yolov5.py:7-29,
176-184) is unnecessary on TPU: XLA fuses BN into the conv at compile time.

Module scope names follow the torch module paths (digit components merged
with '_': "backbones.layer1.0" -> "layer1_0") so reference checkpoints load
through the generic converter.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from simple_pose_tpu.detector.blocks import (
    CBR,
    SPP,
    BottleNeckCSP,
    Focus,
    depth_grow,
    model_scale,
    width_grow,
)

__all__ = ["YOLOv5", "YOLOV5_DEFAULT_ANCHORS", "YOLOV5_DEFAULT_STRIDES", "head_bias_init"]

YOLOV5_DEFAULT_ANCHORS = (
    (10, 13, 16, 30, 33, 23),
    (30, 61, 62, 45, 59, 119),
    (116, 90, 156, 198, 373, 326),
)
YOLOV5_DEFAULT_STRIDES = (8.0, 16.0, 32.0)


def head_bias_init(num_cls, anchor_per_grid, stride):
    """Prior bias: ~8 objects per 640px image, 0.6 class prior
    (yolov5.py:129-133)."""

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((anchor_per_grid, num_cls + 5), dtype=np.float32)
        b[:, 4] += math.log(8.0 / (640.0 / stride) ** 2)
        if num_cls > 1:
            b[:, 5:] += math.log(0.6 / (num_cls - 0.99))
        return jnp.asarray(b.reshape(-1))

    return init


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YOLOv5Backbone(nn.Module):
    depth: float = 0.33
    width: float = 0.50
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = lambda c: width_grow(c, self.width)
        d = lambda n: depth_grow(n, self.depth)
        t, dt = self.train, self.dtype
        x = Focus(w(64), 3, train=t, dtype=dt, name="stem")(x)
        x = CBR(w(128), 3, 2, train=t, dtype=dt, name="layer1_0")(x)
        x = BottleNeckCSP(w(128), d(3), train=t, dtype=dt, name="layer1_1")(x)
        x = CBR(w(256), 3, 2, train=t, dtype=dt, name="layer2_0")(x)
        c3 = BottleNeckCSP(w(256), d(9), train=t, dtype=dt, name="layer2_1")(x)
        x = CBR(w(512), 3, 2, train=t, dtype=dt, name="layer3_0")(c3)
        c4 = BottleNeckCSP(w(512), d(9), train=t, dtype=dt, name="layer3_1")(x)
        x = CBR(w(1024), 3, 2, train=t, dtype=dt, name="layer4_0")(c4)
        x = SPP(w(1024), (5, 9, 13), train=t, dtype=dt, name="layer4_1")(x)
        c5 = BottleNeckCSP(w(1024), d(3), shortcut=False, train=t, dtype=dt, name="layer4_2")(x)
        return [c3, c4, c5]


class YOLOv5Neck(nn.Module):
    """PANet: top-down nearest-upsample fusion + bottom-up strided re-fusion
    (yolov5.py:80-104)."""

    c3: int
    c4: int
    c5: int
    blocks: int = 1
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        c3, c4, c5 = xs
        t, dt = self.train, self.dtype
        latent_c5 = CBR(self.c4, 1, 1, train=t, dtype=dt, name="latent_c5")(c5)
        f4 = jnp.concatenate([_upsample2(latent_c5), c4], axis=-1)
        c4_fuse = BottleNeckCSP(self.c4, self.blocks, shortcut=False, train=t, dtype=dt,
                                name="c4_fuse")(f4)
        latent_c4 = CBR(self.c3, 1, 1, train=t, dtype=dt, name="latent_c4")(c4_fuse)
        f3 = jnp.concatenate([_upsample2(latent_c4), c3], axis=-1)
        c3_out = BottleNeckCSP(self.c3, self.blocks, shortcut=False, train=t, dtype=dt,
                               name="c3_out")(f3)
        c3_c4 = CBR(self.c3, 3, 2, train=t, dtype=dt, name="c3_c4")(c3_out)
        c4_out = BottleNeckCSP(self.c4, self.blocks, shortcut=False, train=t, dtype=dt,
                               name="c4_out")(
            jnp.concatenate([c3_c4, latent_c4], axis=-1)
        )
        c4_c5 = CBR(self.c4, 3, 2, train=t, dtype=dt, name="c4_c5")(c4_out)
        c5_out = BottleNeckCSP(self.c5, self.blocks, shortcut=False, train=t, dtype=dt,
                               name="c5_out")(
            jnp.concatenate([c4_c5, latent_c5], axis=-1)
        )
        return [c3_out, c4_out, c5_out]


class YOLOHead(nn.Module):
    """Shared v4/v5 anchor head with in-jit decode (yolov5.py:107-156)."""

    num_cls: int = 80
    anchors: Sequence[Sequence[float]] = YOLOV5_DEFAULT_ANCHORS
    strides: Sequence[float] = YOLOV5_DEFAULT_STRIDES
    decode: bool = True  # inference decode; False -> raw per-level maps
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        num_out = self.num_cls + 5
        apg = len(self.anchors[0]) // 2
        outs, raw = [], []
        for i, x in enumerate(xs):
            head = nn.Conv(
                num_out * apg, (1, 1), use_bias=True,
                bias_init=head_bias_init(self.num_cls, apg, self.strides[i]),
                name=f"heads_{i}", dtype=self.dtype,
            )
            y = head(x)  # [B, ny, nx, apg*num_out]
            b, ny, nx, _ = y.shape
            y = y.reshape(b, ny, nx, apg, num_out).transpose(0, 3, 1, 2, 4)  # [B, apg, ny, nx, out]
            raw.append(y)
            if self.decode:
                # box decode in f32: grid offsets up to 80 and stride scaling
                # would eat bf16 mantissa (the [B,A,out] tensor is tiny)
                y = y.astype(jnp.float32)
                gx = jnp.arange(nx, dtype=jnp.float32)[None, None, None, :]
                gy = jnp.arange(ny, dtype=jnp.float32)[None, None, :, None]
                anc = jnp.asarray(self.anchors[i], jnp.float32).reshape(1, apg, 1, 1, 2)
                s = nn.sigmoid(y)
                xy = jnp.stack(
                    [
                        (s[..., 0] * 2.0 - 0.5 + gx) * self.strides[i],
                        (s[..., 1] * 2.0 - 0.5 + gy) * self.strides[i],
                    ],
                    axis=-1,
                )
                wh = (s[..., 2:4] * 2.0) ** 2 * anc
                out = jnp.concatenate([xy, wh, s[..., 4:]], axis=-1)
                outs.append(out.reshape(b, -1, num_out))
        if self.decode:
            return jnp.concatenate(outs, axis=1)
        norm_anchors = jnp.asarray(self.anchors, jnp.float32).reshape(len(self.anchors), -1, 2) / jnp.asarray(
            self.strides, jnp.float32
        ).reshape(-1, 1, 1)
        return raw, norm_anchors


class YOLOv5(nn.Module):
    num_cls: int = 80
    scale_name: str = "s"
    anchors: Sequence[Sequence[float]] = YOLOV5_DEFAULT_ANCHORS
    strides: Sequence[float] = YOLOV5_DEFAULT_STRIDES
    train: bool = False
    decode: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        depth, width = model_scale(self.scale_name)
        backbone = YOLOv5Backbone(depth, width, self.train, self.dtype, name="backbones")
        c3, c4, c5 = (width_grow(c, width) for c in (256, 512, 1024))
        xs = backbone(x)
        xs = YOLOv5Neck(c3, c4, c5, depth_grow(3, depth), self.train, self.dtype, name="neck")(xs)
        return YOLOHead(self.num_cls, self.anchors, self.strides,
                        decode=self.decode and not self.train, dtype=self.dtype,
                        name="head")(xs)
