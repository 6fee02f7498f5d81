"""Pose ResNet family: SimpleBaselines (deconv head) and FastPose (DUC head).

TPU-native re-implementation of nets/pose_resnet_dconv.py and
nets/pose_resnet_duc.py as one flax.linen model: a torchvision-style ResNet
trunk (BasicBlock/Bottleneck, groups/width for ResNeXt & wide variants,
optional SE attention) with either

  * head='dconv': 3 x [ConvTranspose k4 s2 -> BN -> ReLU] to 256 channels,
    then a 1x1 conv to num_joints (pose_resnet_dconv.py:230-249, 173-178)
  * head='duc':   PixelShuffle(2) -> DUC(1024) -> DUC(512) -> 3x3 conv to
    num_joints (pose_resnet_duc.py:227-232, 172-177)

Parity quirk preserved: the reference only passes ``reduction`` (SE) to the
first block of a stage and only when that block carries a downsample
projection (pose_resnet_dconv.py:212-221), so e.g. BasicBlock layer1 has no
SE even with reduction=True.

Input is NHWC [B, 256, 192, 3]; output heatmaps NHWC [B, 64, 48, J].
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simple_pose_tpu.models.layers import (
    DUC,
    HEAD_INIT,
    SELayer,
    TorchConvTranspose,
    batch_norm,
    conv,
    conv1x1,
    conv3x3,
    max_pool_3x3_s2,
    pixel_shuffle,
)

__all__ = ["PoseResNet", "RESNET_SPECS", "build_resnet"]


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    se: bool = False
    train: bool = False
    dtype: Any = None

    expansion = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = conv3x3(self.planes, self.stride, name="conv1", dtype=self.dtype)(x)
        out = batch_norm(self.train, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv3x3(self.planes, name="conv2", dtype=self.dtype)(out)
        out = batch_norm(self.train, name="bn2", dtype=self.dtype)(out)
        if self.se:
            out = SELayer(self.planes, name="se", dtype=self.dtype)(out)
        if self.use_downsample:
            identity = conv1x1(self.planes, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            identity = batch_norm(self.train, name="downsample_bn", dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    use_downsample: bool = False
    se: bool = False
    train: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = None

    expansion = 4

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion
        identity = x
        out = conv1x1(width, name="conv1", dtype=self.dtype)(x)
        out = batch_norm(self.train, name="bn1", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv3x3(width, self.stride, groups=self.groups, name="conv2", dtype=self.dtype)(out)
        out = batch_norm(self.train, name="bn2", dtype=self.dtype)(out)
        out = nn.relu(out)
        out = conv1x1(out_ch, name="conv3", dtype=self.dtype)(out)
        out = batch_norm(self.train, name="bn3", dtype=self.dtype)(out)
        if self.se:
            out = SELayer(out_ch, name="se", dtype=self.dtype)(out)
        if self.use_downsample:
            identity = conv1x1(out_ch, self.stride, name="downsample_conv", dtype=self.dtype)(x)
            identity = batch_norm(self.train, name="downsample_bn", dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class PoseResNet(nn.Module):
    """:param block: 'basic' | 'bottleneck'
    :param layers: blocks per stage, e.g. (3, 4, 6, 3) for resnet50
    :param head: 'dconv' | 'duc'
    :param se: SE attention in stage-leading blocks (the reference
        ``reduction`` flag)"""

    block: str = "bottleneck"
    layers: Sequence[int] = (3, 4, 6, 3)
    head: str = "dconv"
    num_joints: int = 17
    groups: int = 1
    width_per_group: int = 64
    se: bool = False
    train: bool = False
    dtype: Any = None
    remat: bool = False  # rematerialize blocks: trade FLOPs for activation
    # memory (jax.checkpoint), enabling larger per-chip batches

    def layer1_block_names(self):
        """Block names for ops/pallas_bottleneck.fold_bottleneck_blocks (the
        fused eval-mode layer1 path); None when this trunk doesn't qualify
        (BasicBlock math differs; grouped convs don't fold to dense matmuls)."""
        if self.block != "bottleneck" or self.groups != 1:
            return None
        return [f"layer1_{i}" for i in range(self.layers[0])]

    @nn.compact
    def __call__(self, x, layer1_folded=None):
        """layer1_folded: optional pre-folded layer1 Bottleneck-chain weights
        (see PoseHRNet.__call__) -- fused eval-mode Pallas path; layer1
        params in the variables dict are then unused by apply."""
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = block_cls.expansion
        if self.remat:
            block_cls = nn.remat(block_cls)

        x = conv(64, 7, stride=2, padding=3, name="conv1", dtype=self.dtype)(x)
        x = batch_norm(self.train, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = max_pool_3x3_s2(x)

        inplanes = 64
        for stage_idx, (planes, blocks, stride) in enumerate(
            zip((64, 128, 256, 512), self.layers, (1, 2, 2, 2)), start=1
        ):
            if stage_idx == 1 and layer1_folded is not None:
                from simple_pose_tpu.ops.pallas_bottleneck import bottleneck_chain_pallas

                x = bottleneck_chain_pallas(
                    x, layer1_folded, compute_dtype=self.dtype or jnp.float32,
                    interpret=jax.default_backend() != "tpu")
                inplanes = planes * expansion
                continue
            for i in range(blocks):
                s = stride if i == 0 else 1
                use_ds = i == 0 and (s != 1 or inplanes != planes * expansion)
                kwargs = dict(
                    planes=planes,
                    stride=s,
                    use_downsample=use_ds,
                    se=self.se and use_ds,  # reference passes reduction only here
                    train=self.train,
                    dtype=self.dtype,
                    name=f"layer{stage_idx}_{i}",
                )
                if block_cls is Bottleneck:
                    kwargs.update(groups=self.groups, base_width=self.width_per_group)
                x = block_cls(**kwargs)(x)
                inplanes = planes * expansion

        if self.head == "dconv":
            for i in range(3):
                x = TorchConvTranspose(256, 4, 2, 1, name=f"deconv_{i}", dtype=self.dtype)(x)
                x = batch_norm(self.train, name=f"deconv_bn_{i}", dtype=self.dtype)(x)
                x = nn.relu(x)
            x = conv(self.num_joints, 1, use_bias=True, kernel_init=HEAD_INIT, name="final_layer",
                     dtype=self.dtype)(x)
        elif self.head == "duc":
            x = pixel_shuffle(x, 2)
            x = DUC(1024, train=self.train, name="duc_1", dtype=self.dtype)(x)
            x = DUC(512, train=self.train, name="duc_2", dtype=self.dtype)(x)
            x = conv(self.num_joints, 3, padding=1, use_bias=True, kernel_init=HEAD_INIT,
                     name="final_layer", dtype=self.dtype)(x)
        else:
            raise ValueError(f"unknown head {self.head!r}")
        return x


# name -> (block, layers, extra kwargs); mirrors the reference factories
# (pose_resnet_dconv.py:282-403)
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2), {}),
    "resnet34": ("basic", (3, 4, 6, 3), {}),
    "resnet50": ("bottleneck", (3, 4, 6, 3), {}),
    "resnet101": ("bottleneck", (3, 4, 23, 3), {}),
    "resnet152": ("bottleneck", (3, 8, 36, 3), {}),
    "resnext50_32x4d": ("bottleneck", (3, 4, 6, 3), {"groups": 32, "width_per_group": 4}),
    "resnext101_32x8d": ("bottleneck", (3, 4, 23, 3), {"groups": 32, "width_per_group": 8}),
    "wide_resnet50_2": ("bottleneck", (3, 4, 6, 3), {"width_per_group": 128}),
    "wide_resnet101_2": ("bottleneck", (3, 4, 23, 3), {"width_per_group": 128}),
}


def build_resnet(name: str, head: str = "dconv", num_joints: int = 17, se: bool = False,
                 train: bool = False, dtype=None, remat: bool = False):
    block, layers, extra = RESNET_SPECS[name]
    return PoseResNet(block=block, layers=layers, head=head, num_joints=num_joints, se=se,
                      train=train, dtype=dtype, remat=remat, **extra)
