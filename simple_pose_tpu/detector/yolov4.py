"""YOLOv4 detector (flax, NHWC) -- re-implementation of
detector/nets/yolov4.py: Mish-activated CSPDarknet backbone, SPPCSP +
BottleNeckCSP2 PAN neck, same anchor head/decode as YOLOv5.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from simple_pose_tpu.detector.blocks import (
    CBR,
    SPPCSP,
    BottleNeck,
    BottleNeckCSP,
    BottleNeckCSP2,
    depth_grow,
    mish,
    model_scale,
    width_grow,
)
from simple_pose_tpu.detector.yolov5 import YOLOHead

__all__ = ["YOLOv4", "YOLOV4_DEFAULT_ANCHORS"]

YOLOV4_DEFAULT_ANCHORS = (
    (12, 16, 19, 36, 40, 28),
    (36, 75, 76, 55, 72, 146),
    (142, 110, 192, 243, 459, 401),
)
YOLOV4_DEFAULT_STRIDES = (8.0, 16.0, 32.0)


def _upsample2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class YOLOv4Backbone(nn.Module):
    depth: float = 0.33
    width: float = 0.50
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        w = lambda c: width_grow(c, self.width)
        d = lambda n: depth_grow(n, self.depth)
        t = self.train
        x = CBR(w(32), 3, 1, act=mish, train=t, name="layer1_0", dtype=self.dtype)(x)
        x = CBR(w(64), 3, 2, act=mish, train=t, name="layer1_1", dtype=self.dtype)(x)
        x = BottleNeck(w(64), act=mish, train=t, name="layer1_2", dtype=self.dtype)(x)
        x = CBR(w(128), 3, 2, act=mish, train=t, name="layer2_0", dtype=self.dtype)(x)
        x = BottleNeckCSP(w(128), d(2), act=mish, train=t, name="layer2_1", dtype=self.dtype)(x)
        x = CBR(w(256), 3, 2, act=mish, train=t, name="layer3_0", dtype=self.dtype)(x)
        c3 = BottleNeckCSP(w(256), d(8), act=mish, train=t, name="layer3_1", dtype=self.dtype)(x)
        x = CBR(w(512), 3, 2, act=mish, train=t, name="layer4_0", dtype=self.dtype)(c3)
        c4 = BottleNeckCSP(w(512), d(8), act=mish, train=t, name="layer4_1", dtype=self.dtype)(x)
        x = CBR(w(1024), 3, 2, act=mish, train=t, name="layer5_0", dtype=self.dtype)(c4)
        c5 = BottleNeckCSP(w(1024), d(4), act=mish, train=t, name="layer5_1", dtype=self.dtype)(x)
        return [c3, c4, c5]


class YOLOv4Neck(nn.Module):
    """(detector/nets/yolov4.py:56-93)"""

    c2: int
    c3: int
    c4: int
    c5: int
    blocks: int = 1
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, xs):
        c3, c4, c5 = xs
        t = self.train
        sppcsp = SPPCSP(self.c4, act=mish, train=t, dtype=self.dtype, name="sppcsp")(c5)
        f4 = BottleNeckCSP2(self.c3, self.blocks, act=mish, expansion=1.0, train=t, dtype=self.dtype, name="f4")(
            jnp.concatenate(
                [
                    CBR(self.c3, 1, 1, act=mish, train=t, dtype=self.dtype, name="c4_to_f4")(c4),
                    _upsample2(CBR(self.c3, 1, 1, act=mish, train=t, dtype=self.dtype, name="c5_latent")(sppcsp)),
                ],
                axis=-1,
            )
        )
        f3 = BottleNeckCSP2(self.c2, self.blocks, act=mish, expansion=1.0, train=t, dtype=self.dtype, name="f3")(
            jnp.concatenate(
                [
                    CBR(self.c2, 1, 1, act=mish, train=t, dtype=self.dtype, name="c3_to_f3")(c3),
                    _upsample2(CBR(self.c2, 1, 1, act=mish, train=t, dtype=self.dtype, name="f4_latent")(f4)),
                ],
                axis=-1,
            )
        )
        f3_out = CBR(self.c3, 3, 1, act=mish, train=t, dtype=self.dtype, name="f3_out")(f3)
        f4_2 = BottleNeckCSP2(self.c3, self.blocks, act=mish, expansion=1.0, train=t, dtype=self.dtype, name="f4_2")(
            jnp.concatenate([CBR(self.c3, 3, 2, act=mish, train=t, dtype=self.dtype, name="f3_to_f4")(f3), f4], axis=-1)
        )
        f4_out = CBR(self.c4, 3, 1, act=mish, train=t, dtype=self.dtype, name="f4_out")(f4_2)
        f5 = BottleNeckCSP2(self.c4, self.blocks, act=mish, expansion=1.0, train=t, dtype=self.dtype, name="f5")(
            jnp.concatenate([CBR(self.c4, 3, 2, act=mish, train=t, dtype=self.dtype, name="f4_to_f5")(f4_2), sppcsp], axis=-1)
        )
        f5_out = CBR(self.c5, 3, 1, act=mish, train=t, dtype=self.dtype, name="f5_out")(f5)
        return [f3_out, f4_out, f5_out]


class YOLOv4(nn.Module):
    num_cls: int = 80
    scale_name: str = "s"
    anchors: Sequence[Sequence[float]] = YOLOV4_DEFAULT_ANCHORS
    strides: Sequence[float] = YOLOV4_DEFAULT_STRIDES
    train: bool = False
    decode: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        depth, width = model_scale(self.scale_name)
        xs = YOLOv4Backbone(depth, width, self.train, self.dtype, name="backbones")(x)
        c2, c3, c4, c5 = (width_grow(c, width) for c in (128, 256, 512, 1024))
        xs = YOLOv4Neck(c2, c3, c4, c5, depth_grow(2, depth), self.train, self.dtype,
                        name="neck")(xs)
        return YOLOHead(self.num_cls, self.anchors, self.strides,
                        decode=self.decode and not self.train, dtype=self.dtype,
                        name="head")(xs)
