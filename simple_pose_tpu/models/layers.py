"""Torch-compatible NHWC building blocks (flax.linen).

Every primitive here is layout/semantics-matched to the torch op the
reference uses, so converted checkpoints reproduce activations exactly:

  * conv / conv3x3 / conv1x1  -> nn.Conv2d with explicit symmetric padding
  * TorchConvTranspose        -> nn.ConvTranspose2d(k, s, p) realized as
    lax.conv_general_dilated with lhs_dilation (input dilation) + kernel
    flip: exact, full-control equivalence (no library padding guesswork)
  * batch_norm                -> nn.BatchNorm2d (momentum 0.1 torch == 0.9
    flax, eps 1e-5); under pjit with a sharded batch the statistics are
    global, which IS SyncBatchNorm (ddp_pose_resnet_solver.py:89-90) for free
  * pixel_shuffle             -> nn.PixelShuffle channel-ordering parity
  * max_pool_3x3_s2           -> nn.MaxPool2d(3, 2, 1) (-inf padding)
  * SELayer                   -> nets/commons.py:4-18 (reduction defaults 1)
  * DUC                       -> nets/commons.py:21-43

Tensors are NHWC (TPU-native); the weight converter (convert/torch2flax.py)
maps torch OIHW/IOHW kernels into the layouts declared here.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# Head layers keep the reference's normal(0.001) (pose_resnet_dconv.py:
# 180-189 -- stable heatmap regression); backbone convs use He fan-out like
# torch's kaiming_normal_, because the reference's blanket 0.001 init is only
# viable there since ImageNet weights overwrite the trunk (strict=False
# load); training from scratch with 0.001 everywhere cannot move.
HEAD_INIT = nn.initializers.normal(stddev=0.001)
BODY_INIT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
KERNEL_INIT = BODY_INIT


def conv(features, kernel, stride=1, padding=0, groups=1, use_bias=False, name=None, dilation=1,
         kernel_init=None, dtype=None):
    """``dtype`` is the flax compute dtype: params stay float32
    (param_dtype default) and are cast at use, so ``dtype=jnp.bfloat16``
    gives TPU mixed precision without touching the stored weights."""
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        feature_group_count=groups,
        use_bias=use_bias,
        kernel_init=kernel_init if kernel_init is not None else BODY_INIT,
        kernel_dilation=(dilation, dilation),
        dtype=dtype,
        name=name,
    )


def conv3x3(features, stride=1, groups=1, dilation=1, name=None, dtype=None):
    return conv(features, 3, stride, dilation, groups=groups, dilation=dilation, name=name,
                dtype=dtype)


def conv1x1(features, stride=1, name=None, dtype=None):
    return conv(features, 1, stride, 0, name=name, dtype=dtype)


def batch_norm(train: bool, name=None, momentum=0.9, dtype=None):
    """flax computes BN statistics in (at least) float32 regardless of
    ``dtype`` and stores batch_stats as float32, so bf16 compute is safe."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
    )


class TorchConvTranspose(nn.Module):
    """Exact nn.ConvTranspose2d(in, out, k, s, p, output_padding=0, bias=False).

    Stored kernel layout is [kH, kW, in, out]; the forward pass dilates the
    input by the stride and convolves with the spatially flipped kernel,
    padded by (k - 1 - p): the textbook transpose-conv identity, which gives
    bit-exact parity with torch for the reference head config (k4 s2 p1,
    pose_resnet_dconv.py:230-249).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        w = self.param("kernel", HEAD_INIT, (self.kernel, self.kernel, in_ch, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            w = w.astype(self.dtype)
        pad = self.kernel - 1 - self.padding
        dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            x,
            w[::-1, ::-1],
            window_strides=(1, 1),
            padding=[(pad, pad), (pad, pad)],
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + (b.astype(self.dtype) if self.dtype is not None else b)
        return y


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle with torch channel-ordering parity.

    torch: out[b, c, h*r+i, w*r+j] = in[b, c*r^2 + i*r + j, h, w]."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H, r_i, W, r_j, C]
    return x.reshape(b, h * r, w * r, c)


def max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel_size=3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class SELayer(nn.Module):
    """Squeeze-excitation gate; reference uses reduction ratio 1 (no
    bottleneck) -- nets/commons.py:4-18."""

    channel: int
    reduction: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = conv(self.channel // self.reduction, 1, use_bias=True, name="fc1", dtype=self.dtype)(y)
        y = nn.relu(y)
        y = conv(self.channel, 1, use_bias=True, name="fc2", dtype=self.dtype)(y)
        y = nn.sigmoid(y)
        return x * y


class DUC(nn.Module):
    """Dense upsampling conv: 3x3 conv -> BN -> ReLU -> PixelShuffle
    (nets/commons.py:21-43)."""

    planes: int
    upscale: int = 2
    train: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = conv3x3(self.planes, name="conv", dtype=self.dtype)(x)
        x = batch_norm(self.train, name="bn", dtype=self.dtype)(x)
        x = nn.relu(x)
        return pixel_shuffle(x, self.upscale)
