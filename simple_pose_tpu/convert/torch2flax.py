"""PyTorch checkpoint -> flax variables converter.

Converts reference checkpoints (pose_resnet_dconv / pose_resnet_duc /
pose_hrnet state_dicts, or torchvision ImageNet backbones) into the param /
batch_stats trees of simple_pose_tpu models, for weight-parity evaluation and
pretrained bootstrap (the reference loads torchvision URLs with strict=False,
pose_resnet_dconv.py:271-279, and filtered HRNet weights,
pose_hrnet.py:474-486).

Layout transforms:
  * conv weight           OIHW -> HWIO   (transpose 2,3,1,0)
  * conv-transpose weight IOHW -> HWIO'  (transpose 2,3,0,1; the spatial flip
    happens inside TorchConvTranspose at call time)
  * batchnorm             weight->scale, bias->bias,
                          running_mean/var -> batch_stats
Unknown keys (classifier heads, num_batches_tracked) are skipped, mirroring
strict=False semantics; a 'module.' DataParallel prefix is stripped
(commons/model_utils.py:20-26).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np

__all__ = ["convert_torch_state", "merge_converted", "translate_key"]


def _to_numpy(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


_BN_SUFFIX = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _resnet_module(parts) -> Tuple[Tuple[str, ...], str]:
    """Map a torch module path (no trailing param name) for the ResNet family
    to (flax module path, kind); kind in {conv, deconv, bn}."""
    p = parts
    if p[0] in ("conv1",):
        return ("conv1",), "conv"
    if p[0] == "bn1":
        return ("bn1",), "bn"
    m = re.fullmatch(r"layer(\d+)", p[0])
    if m:
        blk = f"layer{m.group(1)}_{p[1]}"
        rest = p[2:]
        if rest[0] in ("conv1", "conv2", "conv3"):
            return (blk, rest[0]), "conv"
        if rest[0] in ("bn1", "bn2", "bn3"):
            return (blk, rest[0]), "bn"
        if rest[0] == "downsample":
            return (blk, "downsample_conv" if rest[1] == "0" else "downsample_bn"), (
                "conv" if rest[1] == "0" else "bn"
            )
        if rest[0] == "se":
            # torch: se.fc.0 / se.fc.2 (nets/commons.py:8-13)
            fc = "fc1" if rest[2] == "0" else "fc2"
            return (blk, "se", fc), "conv"
    if p[0] == "deconv_layers":
        idx = int(p[1])
        if idx % 3 == 0:
            return (f"deconv_{idx // 3}",), "deconv"
        return (f"deconv_bn_{idx // 3}",), "bn"
    if p[0] == "duc_layers":
        # duc_layers.0 is the parameterless PixelShuffle
        sub = "conv" if p[2] == "conv" else "bn"
        return (f"duc_{p[1]}", sub), ("conv" if sub == "conv" else "bn")
    if p[0] == "final_layer":
        return ("final_layer",), "conv"
    raise KeyError(".".join(parts))


def _hrnet_module(parts) -> Tuple[Tuple[str, ...], str]:
    p = parts
    if p[0] in ("conv1", "conv2"):
        return (p[0],), "conv"
    if p[0] in ("bn1", "bn2"):
        return (p[0],), "bn"
    if p[0] == "layer1":
        blk = f"layer1_m0_b0_{p[1]}"
        return _block_sub(blk, p[2:])
    m = re.fullmatch(r"transition(\d+)", p[0])
    if m:
        t, i = m.group(1), p[1]
        if len(p) == 3:  # transitionT.I.{0|1}: ConvBNReLU on an existing branch
            name = f"transition{t}_{i}"
            return ((name,), "conv") if p[2] == "0" else ((f"{name}_bn",), "bn")
        # transitionT.I.J.{0|1}: downsample chain for a new branch
        name = f"transition{t}_{i}_{p[2]}"
        return ((name,), "conv") if p[3] == "0" else ((f"{name}_bn",), "bn")
    m = re.fullmatch(r"stage(\d+)", p[0])
    if m:
        s, mod = m.group(1), p[1]
        if p[2] == "branches":
            blk = f"stage{s}_m{mod}_b{p[3]}_{p[4]}"
            return _block_sub(blk, p[5:])
        if p[2] == "fuse_layers":
            i, j = int(p[3]), int(p[4])
            if j > i:  # Sequential(conv1x1, BN, Upsample)
                name = f"stage{s}_m{mod}_fuse_{i}_{j}"
                return ((name,), "conv") if p[5] == "0" else ((f"{name}_bn",), "bn")
            # j < i: Sequential of Sequential(conv, bn[, relu])
            name = f"stage{s}_m{mod}_fuse_{i}_{j}_{p[5]}"
            return ((name,), "conv") if p[6] == "0" else ((f"{name}_bn",), "bn")
    if p[0] == "final_layer":
        return ("final_layer",), "conv"
    raise KeyError(".".join(parts))


def _block_sub(blk, rest):
    if rest[0].startswith("conv"):
        return (blk, rest[0]), "conv"
    if rest[0].startswith("bn"):
        return (blk, rest[0]), "bn"
    if rest[0] == "downsample":
        return (blk, "downsample_conv" if rest[1] == "0" else "downsample_bn"), (
            "conv" if rest[1] == "0" else "bn"
        )
    raise KeyError(f"{blk}.{'.'.join(rest)}")


def translate_key(key: str, family: str):
    """torch state_dict key -> (collection, flax path tuple, transform name).

    Returns None for keys to skip (num_batches_tracked, fc heads, ...)."""
    if key.startswith("module."):
        key = key[len("module."):]
    parts = key.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None
    try:
        path, kind = (_hrnet_module if family == "hrnet" else _resnet_module)(parts[:-1])
    except (KeyError, IndexError):
        return None
    if kind == "bn":
        coll, name = _BN_SUFFIX[leaf]
        return coll, path + (name,), "identity"
    if kind in ("conv", "deconv"):
        if leaf == "weight":
            return "params", path + ("kernel",), ("deconv" if kind == "deconv" else "conv")
        if leaf == "bias":
            return "params", path + ("bias",), "identity"
    return None


_TRANSFORMS = {
    "identity": lambda v: v,
    "conv": lambda v: np.transpose(v, (2, 3, 1, 0)),
    "deconv": lambda v: np.transpose(v, (2, 3, 0, 1)),
}


def convert_torch_state(state_dict: Dict[str, "np.ndarray"], family: str):
    """Convert a torch state_dict (tensors or arrays) to nested flax
    variables {'params': ..., 'batch_stats': ...}.

    :param family: 'resnet' | 'hrnet'
    :returns: (variables dict, skipped key list)
    """
    out = {"params": {}, "batch_stats": {}}
    skipped = []
    for key, val in state_dict.items():
        tr = translate_key(key, family)
        if tr is None:
            skipped.append(key)
            continue
        coll, path, transform = tr
        node = out[coll]
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = _TRANSFORMS[transform](_to_numpy(val))
    return out, skipped


def merge_converted(variables, converted, strict: bool = False):
    """Overlay converted leaves onto an initialized variable tree
    (strict=False partial-load semantics).

    :returns: (merged tree, missing paths, unexpected paths)
    """
    import jax

    flat_init = {tuple(k.key for k in kp): v
                 for kp, v in jax.tree_util.tree_flatten_with_path(variables)[0]}
    flat_new = {tuple(k.key for k in kp): v
                for kp, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    missing = [k for k in flat_init if k not in flat_new]
    unexpected = [k for k in flat_new if k not in flat_init]
    if strict and (missing or unexpected):
        raise ValueError(f"missing: {missing}\nunexpected: {unexpected}")
    merged = dict(flat_init)
    for k, v in flat_new.items():
        if k in merged:
            if merged[k].shape != v.shape:
                raise ValueError(f"shape mismatch at {k}: {merged[k].shape} vs {v.shape}")
            merged[k] = v.astype(merged[k].dtype) if hasattr(merged[k], "dtype") else v
    # rebuild nested
    out = {}
    for k, v in merged.items():
        node = out
        for part in k[:-1]:
            node = node.setdefault(part, {})
        node[k[-1]] = v
    return out, missing, unexpected


def _merge_digit_components(parts):
    """['backbones','layer1','0','conv'] -> ['backbones','layer1_0','conv']:
    torch Sequential indices fold into the parent scope name, matching the
    detector module naming convention."""
    out = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def convert_torch_state_generic(state_dict):
    """Rank-based torch->flax conversion for models whose flax scope names
    mirror the torch module paths (the detector family).

    BatchNorm modules are identified by a sibling running_mean; 4-D weights
    are conv kernels (OIHW->HWIO); 1-D weight/bias map to scale/bias.
    Returns (variables, skipped keys)."""
    clean = {}
    for k, v in state_dict.items():
        clean[k[len("module."):] if k.startswith("module.") else k] = v
    bn_prefixes = {k.rsplit(".", 1)[0] for k in clean if k.endswith("running_mean")}
    out = {"params": {}, "batch_stats": {}}
    skipped = []
    for key, val in clean.items():
        if "." not in key:
            skipped.append(key)
            continue
        prefix, leaf = key.rsplit(".", 1)
        if leaf == "num_batches_tracked":
            continue
        path = tuple(_merge_digit_components(prefix.split(".")))
        arr = _to_numpy(val)
        if prefix in bn_prefixes:
            if leaf not in _BN_SUFFIX:
                skipped.append(key)
                continue
            coll, name = _BN_SUFFIX[leaf]
        elif leaf == "weight":
            coll, name = "params", "kernel"
            if arr.ndim == 4:
                arr = np.transpose(arr, (2, 3, 1, 0))
        elif leaf == "bias":
            coll, name = "params", "bias"
        else:
            skipped.append(key)
            continue
        node = out[coll]
        for part in path:
            node = node.setdefault(part, {})
        node[name] = arr
    return out, skipped
