"""Detector building blocks (flax.linen, NHWC).

Re-implements detector/nets/commons.py + activations.py.  Module/parameter
scope names match the reference torch module paths exactly (CBR.conv, CBR.bn,
BottleNeckCSP.conv1_0/conv2_0/conv1_n/conv1_s.N/conv3/bn, ...) so reference
checkpoints convert with the generic rank-based translator in
convert/torch2flax.py -- no per-architecture rename table.

Activations: Hardswish (x * relu6(x+3) / 6 -- the export-friendly hardtanh
form of activations.py), Mish (x * tanh(softplus(x)); the reference's
MemoryEfficientMish computes the same function), Swish/SiLU, FReLU.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "model_scale", "width_grow", "depth_grow",
    "hardswish", "mish", "swish", "CBR", "Focus", "BottleNeck",
    "BottleNeckCSP", "BottleNeckCSP2", "SPP", "SPPCSP", "FReLU",
]


def model_scale(name: str = "s"):
    scales = {"s": (0.33, 0.50), "m": (0.67, 0.75), "l": (1.00, 1.00), "x": (1.33, 1.25)}
    if name not in scales:
        raise NotImplementedError("scale_name only support s,m,l,x")
    return scales[name]


def make_divisible(x, divisor):
    return math.ceil(x / divisor) * divisor


def depth_grow(x: int, depth_multiples: float):
    return max(round(x * depth_multiples), 1) if x > 1 else x


def width_grow(x, width_multiples):
    return make_divisible(x * width_multiples, 8)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x):
    return x * jnp.tanh(jnp.logaddexp(x, 0.0))


def swish(x):
    return x * nn.sigmoid(x)


def _conv(features, k, s=1, p=None, groups=1, bias=False, name=None, dtype=None):
    if p is None:
        p = (k - 1) // 2
    return nn.Conv(features, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                   feature_group_count=groups, use_bias=bias, name=name, dtype=dtype)


def _bn(train, name=None, dtype=None):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name,
                        dtype=dtype)


class CBR(nn.Module):
    """Conv-BN-activation (detector/nets/commons.py:32-48)."""

    features: int
    kernel: int = 1
    stride: int = 1
    padding: int = -1  # -1: same
    groups: int = 1
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None  # flax compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        p = None if self.padding < 0 else self.padding
        x = _conv(self.features, self.kernel, self.stride, p, self.groups, name="conv",
                  dtype=self.dtype)(x)
        x = _bn(self.train, name="bn", dtype=self.dtype)(x)
        return self.act(x) if self.act else x


class Focus(nn.Module):
    """Space-to-depth stem: concat 4 pixel phases then CBR
    (detector/nets/commons.py:51-59; phase order parity with torch)."""

    features: int
    kernel: int = 1
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # reshape+transpose space-to-depth instead of four strided slices:
        # the slice form lowers to an HBM-bound gather on TPU (measured
        # 3.3 ms of a 29 ms fused detect+pose batch); this layout-op form is
        # element-identical with the same torch phase order
        # [(0,0), (1,0), (0,1), (1,1)] along channels.
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        x = x.transpose(0, 1, 3, 4, 2, 5)  # [B, h/2, w/2, dj, di, C]
        x = x.reshape(b, h // 2, w // 2, 4 * c)
        return CBR(self.features, self.kernel, act=self.act, train=self.train, name="conv",
                   dtype=self.dtype)(x)


class BottleNeck(nn.Module):
    features: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = int(self.features * self.expansion)
        out = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv1", dtype=self.dtype)(x)
        out = CBR(self.features, 3, 1, groups=self.groups, act=self.act, train=self.train,
                  name="conv2", dtype=self.dtype)(out)
        if self.shortcut and inner == self.features and x.shape[-1] == self.features:
            out = x + out
        return out


class BottleNeckCSP(nn.Module):
    """(detector/nets/commons.py:80-98)"""

    features: int
    blocks: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = int(self.features * self.expansion)
        y1 = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv1_0", dtype=self.dtype)(x)
        for i in range(self.blocks):
            y1 = BottleNeck(inner, self.shortcut, self.groups, 1.0, self.act, self.train,
                            name=f"conv1_s_{i}", dtype=self.dtype)(y1)
        y1 = _conv(inner, 1, bias=False, name="conv1_n", dtype=self.dtype)(y1)
        y2 = _conv(inner, 1, bias=False, name="conv2_0", dtype=self.dtype)(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = self.act(_bn(self.train, name="bn", dtype=self.dtype)(y))
        return CBR(self.features, 1, 1, act=self.act, train=self.train, name="conv3",
                   dtype=self.dtype)(y)


class BottleNeckCSP2(nn.Module):
    """(detector/nets/commons.py:102-120)"""

    features: int
    blocks: int = 1
    shortcut: bool = False
    groups: int = 1
    expansion: float = 0.5
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = int(self.features * self.expansion)
        x1 = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv0", dtype=self.dtype)(x)
        y1 = x1
        for i in range(self.blocks):
            y1 = BottleNeck(inner, self.shortcut, self.groups, 1.0, self.act, self.train,
                            name=f"conv1_{i}", dtype=self.dtype)(y1)
        y2 = _conv(inner, 1, bias=False, name="conv2", dtype=self.dtype)(x1)
        y = self.act(_bn(self.train, name="bn", dtype=self.dtype)(jnp.concatenate([y1, y2], axis=-1)))
        return CBR(self.features, 1, 1, act=self.act, train=self.train, name="conv3",
                   dtype=self.dtype)(y)


def _maxpool_same(x, k):
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=[(k // 2, k // 2), (k // 2, k // 2)])


class SPP(nn.Module):
    """(detector/nets/commons.py:124-136)"""

    features: int
    kernels: Sequence[int] = (5, 9, 13)
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = x.shape[-1] // 2
        x = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv1", dtype=self.dtype)(x)
        x = jnp.concatenate([x] + [_maxpool_same(x, k) for k in self.kernels], axis=-1)
        return CBR(self.features, 1, 1, act=self.act, train=self.train, name="conv2",
                   dtype=self.dtype)(x)


class SPPCSP(nn.Module):
    """(detector/nets/commons.py:140-162)"""

    features: int
    expansion: float = 0.5
    kernels: Sequence[int] = (5, 9, 13)
    act: Callable = hardswish
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        inner = int(2 * self.features * self.expansion)
        x1 = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv1_start_0",
                 dtype=self.dtype)(x)
        x1 = CBR(inner, 3, 1, act=self.act, train=self.train, name="conv1_start_1",
                 dtype=self.dtype)(x1)
        x1 = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv1_start_2",
                 dtype=self.dtype)(x1)
        y1 = jnp.concatenate([x1] + [_maxpool_same(x1, k) for k in self.kernels], axis=-1)
        y1 = CBR(inner, 1, 1, act=self.act, train=self.train, name="conv1_end_0",
                 dtype=self.dtype)(y1)
        y1 = CBR(inner, 3, 1, act=self.act, train=self.train, name="conv1_end_1",
                 dtype=self.dtype)(y1)
        y2 = _conv(inner, 1, bias=False, name="conv2", dtype=self.dtype)(x)
        y = self.act(_bn(self.train, name="bn", dtype=self.dtype)(jnp.concatenate([y1, y2], axis=-1)))
        return CBR(self.features, 1, 1, act=self.act, train=self.train, name="conv3",
                   dtype=self.dtype)(y)


class FReLU(nn.Module):
    """Funnel activation: max(x, BN(depthwise 3x3 conv(x)))
    (detector/nets/activations.py)."""

    features: int
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        t = _conv(self.features, 3, 1, 1, groups=self.features, name="conv", dtype=self.dtype)(x)
        t = _bn(self.train, name="bn", dtype=self.dtype)(t)
        return jnp.maximum(x, t)
