"""Pose HRNet (W32/W48): multi-resolution branches with all-to-all fusion.

TPU-native re-implementation of nets/pose_hrnet.py driven by the same YAML
topology schema (nets/hrnet_w32.yaml / hrnet_w48.yaml): stem of two stride-2
3x3 convs, a Bottleneck layer1, then stages 2-4 of HighResolutionModules.
Fusion follows pose_hrnet.py:181-259: for target branch i and source j,
j > i uses 1x1 conv + BN + nearest 2^(j-i) upsample, j < i chains (i - j)
stride-2 3x3 conv+BN (ReLU on all but the last), j == i is identity; fused
maps are summed then ReLU'd.  The final 1x1 conv reads the highest-resolution
branch only (multi_scale_output=False on the last stage-4 module).

Nearest upsampling is exact jnp.repeat (no resize interpolation), matching
torch nn.Upsample(mode='nearest').
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import yaml

from simple_pose_tpu.models.layers import HEAD_INIT, batch_norm, conv, conv1x1, conv3x3
from simple_pose_tpu.models.resnet import BasicBlock, Bottleneck

__all__ = ["PoseHRNet", "build_hrnet", "HRNET_W32_CFG", "HRNET_W48_CFG"]


def _hrnet_cfg(width: int) -> Dict[str, Any]:
    """Topology equivalent to nets/hrnet_w{32,48}.yaml."""
    c = width
    return {
        "FINAL_CONV_KERNEL": 1,
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4], "NUM_CHANNELS": [c, 2 * c], "FUSE_METHOD": "SUM"},
        "STAGE3": {"NUM_MODULES": 4, "NUM_BRANCHES": 3, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4, 4], "NUM_CHANNELS": [c, 2 * c, 4 * c], "FUSE_METHOD": "SUM"},
        "STAGE4": {"NUM_MODULES": 3, "NUM_BRANCHES": 4, "BLOCK": "BASIC",
                   "NUM_BLOCKS": [4, 4, 4, 4], "NUM_CHANNELS": [c, 2 * c, 4 * c, 8 * c], "FUSE_METHOD": "SUM"},
    }


HRNET_W32_CFG = _hrnet_cfg(32)
HRNET_W48_CFG = _hrnet_cfg(48)

_BLOCKS = {"BASIC": BasicBlock, "BOTTLENECK": Bottleneck}


def _upsample_nearest(x, factor: int):
    # Single broadcast+reshape (not chained jnp.repeat): one materialization
    # that XLA can fuse into the consuming add instead of two intermediates.
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


class PoseHRNet(nn.Module):
    cfg: Any = None  # topology dict (EXTRA section); default W32
    num_joints: int = 17
    train: bool = False
    dtype: Any = None
    remat: bool = False  # jax.checkpoint each block (memory for FLOPs)

    def layer1_block_names(self):
        """Block names for ops/pallas_bottleneck.fold_bottleneck_blocks (the
        fused eval-mode layer1 path).  HRNet's layer1 is always a stride-1
        Bottleneck chain, so every config qualifies."""
        cfg = self.cfg if self.cfg is not None else HRNET_W32_CFG
        return [f"layer1_m0_b0_{i}" for i in range(cfg.get("LAYER1_NUM_BLOCKS", 4))]

    def _branch(self, x, stage: str, module: int, branch: int, block_name: str,
                num_blocks: int, channels: int, in_channels: int):
        block_cls = _BLOCKS[block_name]
        if self.remat:
            block_cls = nn.remat(block_cls)
        exp = block_cls.expansion
        for i in range(num_blocks):
            use_ds = i == 0 and in_channels != channels * exp
            x = block_cls(
                planes=channels,
                stride=1,
                use_downsample=use_ds,
                train=self.train,
                dtype=self.dtype,
                name=f"{stage}_m{module}_b{branch}_{i}",
            )(x)
            in_channels = channels * exp
        return x

    def _fuse(self, xs, stage: str, module: int, channels, multi_scale: bool):
        """All-to-all fusion (pose_hrnet.py:241-259)."""
        n = len(xs)
        outs = []
        for i in range(n if multi_scale else 1):
            y = None
            for j in range(i):  # finer sources: chained stride-2 3x3 convs
                t = xs[j]
                for k in range(i - j):
                    last = k == i - j - 1
                    out_ch = channels[i] if last else channels[j]
                    t = conv3x3(out_ch, stride=2, name=f"{stage}_m{module}_fuse_{i}_{j}_{k}",
                                dtype=self.dtype)(t)
                    t = batch_norm(self.train, name=f"{stage}_m{module}_fuse_{i}_{j}_{k}_bn",
                                   dtype=self.dtype)(t)
                    if not last:
                        t = nn.relu(t)
                y = t if y is None else y + t
            y = xs[i] if y is None else y + xs[i]
            # Coarser sources (j > i): 1x1 conv + BN at native resolution,
            # then progressive coarse-to-fine accumulation.  up_{2^(j-i)}
            # factors as repeated up2 and nearest upsampling distributes
            # over addition, so summing at each intermediate resolution is
            # exact per term while writing ~2.3x fewer upsampled bytes than
            # per-source full-res materialization (each up2+add fuses).
            acc = None
            for j in range(n - 1, i, -1):
                t = conv1x1(channels[i], name=f"{stage}_m{module}_fuse_{i}_{j}",
                            dtype=self.dtype)(xs[j])
                t = batch_norm(self.train, name=f"{stage}_m{module}_fuse_{i}_{j}_bn",
                               dtype=self.dtype)(t)
                acc = t if acc is None else _upsample_nearest(acc, 2) + t
            if acc is not None:
                y = y + _upsample_nearest(acc, 2)
            outs.append(nn.relu(y))
        return outs

    def _transition(self, ys, t: int, prev_channels, cur_channels):
        """Grow/retarget branches (pose_hrnet.py:327-366 + forward 428-450)."""
        outs = []
        for i in range(len(cur_channels)):
            if i < len(prev_channels):
                if cur_channels[i] != prev_channels[i]:
                    # reference forward feeds y_list[-1] whenever a transition
                    # module exists (pose_hrnet.py:430-431, 438-439, 446-447)
                    x = conv3x3(cur_channels[i], name=f"transition{t}_{i}", dtype=self.dtype)(ys[-1])
                    x = batch_norm(self.train, name=f"transition{t}_{i}_bn", dtype=self.dtype)(x)
                    outs.append(nn.relu(x))
                else:
                    outs.append(ys[i])
            else:
                x = ys[-1]
                for j in range(i + 1 - len(prev_channels)):
                    out_ch = cur_channels[i] if j == i - len(prev_channels) else prev_channels[-1]
                    x = conv3x3(out_ch, stride=2, name=f"transition{t}_{i}_{j}", dtype=self.dtype)(x)
                    x = batch_norm(self.train, name=f"transition{t}_{i}_{j}_bn", dtype=self.dtype)(x)
                    x = nn.relu(x)
                outs.append(x)
        return outs

    @nn.compact
    def __call__(self, x, layer1_folded=None):
        """layer1_folded: optional pre-folded Bottleneck-chain weights
        (ops/pallas_bottleneck.fold_bottleneck_blocks over this model's
        ``layer1_m0_b0_*`` blocks) -- eval-only fast path that runs layer1
        as ONE fused VMEM-resident Pallas kernel (docs/PERF.md round 4:
        1.35x vs XLA convs on the chain).  The layer1 params in the
        variables dict are then simply unused by apply."""
        cfg = self.cfg if self.cfg is not None else HRNET_W32_CFG
        # stem (pose_hrnet.py:276-283)
        x = conv(64, 3, stride=2, padding=1, name="conv1", dtype=self.dtype)(x)
        x = batch_norm(self.train, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = conv(64, 3, stride=2, padding=1, name="conv2", dtype=self.dtype)(x)
        x = batch_norm(self.train, name="bn2", dtype=self.dtype)(x)
        x = nn.relu(x)
        if layer1_folded is not None:
            from simple_pose_tpu.ops.pallas_bottleneck import bottleneck_chain_pallas

            x = bottleneck_chain_pallas(
                x, layer1_folded, compute_dtype=self.dtype or jnp.float32,
                interpret=jax.default_backend() != "tpu")
        else:
            x = self._branch(x, "layer1", 0, 0, "BOTTLENECK",
                             cfg.get("LAYER1_NUM_BLOCKS", 4), 64, 64)

        ys = [x]
        prev_channels = [256]
        stages = [s for s in (2, 3, 4) if f"STAGE{s}" in cfg]
        for s in stages:
            scfg = cfg[f"STAGE{s}"]
            block = scfg["BLOCK"]
            exp = _BLOCKS[block].expansion
            cur_channels = [c * exp for c in scfg["NUM_CHANNELS"]]
            ys = self._transition(ys, s - 1, prev_channels, cur_channels)
            for m in range(scfg["NUM_MODULES"]):
                last_module = m == scfg["NUM_MODULES"] - 1
                multi_scale = not (s == stages[-1] and last_module)
                branch_outs = []
                for b in range(scfg["NUM_BRANCHES"]):
                    branch_outs.append(
                        self._branch(
                            ys[b], f"stage{s}", m, b, block, scfg["NUM_BLOCKS"][b],
                            scfg["NUM_CHANNELS"][b], cur_channels[b],
                        )
                    )
                ys = self._fuse(branch_outs, f"stage{s}", m, cur_channels, multi_scale)
            prev_channels = cur_channels

        k = cfg.get("FINAL_CONV_KERNEL", 1)
        return conv(self.num_joints, k, padding=1 if k == 3 else 0, use_bias=True,
                    kernel_init=HEAD_INIT, name="final_layer", dtype=self.dtype)(ys[0])


def build_hrnet(cfg="w32", num_joints: int = 17, train: bool = False, dtype=None,
                remat: bool = False):
    """cfg: 'w32' | 'w48' | a dict (EXTRA schema) | a YAML path with
    MODEL.EXTRA (the reference nets/hrnet_w32.yaml layout)."""
    if cfg == "w32":
        cfg = HRNET_W32_CFG
    elif cfg == "w48":
        cfg = HRNET_W48_CFG
    elif isinstance(cfg, str):
        with open(cfg) as rf:
            raw = yaml.safe_load(rf)
        cfg = raw["MODEL"]["EXTRA"] if "MODEL" in raw else raw
    return PoseHRNet(cfg=cfg, num_joints=num_joints, train=train, dtype=dtype, remat=remat)
