"""Fused eval-mode Bottleneck-chain Pallas kernel (the HRNet layer1 probe).

HRNet's layer1 (4 Bottlenecks on the full-resolution 64x48x256 stream,
models/hrnet.py; reference pose_hrnet.py layer1) is HBM-roofline-bound: XLA
executes it as ~13 per-tensor HBM passes per block (each conv reads and
writes the full activation).  At eval time BatchNorm is a per-channel
affine, so a whole block chain folds into pure (matmul, bias, relu) ops --
and the entire per-sample working set (64x48 activations + every folded
weight of all 4 blocks, ~2 MB + 0.6 MB) fits in VMEM.

This kernel runs ONE grid step per sample: read the stem output once from
HBM, run every conv of every block as MXU matmuls on VMEM-resident tiles
(the 3x3 as 9 shifted [H*W, C] @ [C, C] contractions on a zero-padded
buffer), and write the chain output once.  HBM traffic drops from
~13 passes/block to exactly one read + one write for the whole chain.

Eval-only by construction: training BN needs cross-batch statistics, which
a per-sample grid cannot produce (and the solver's backward would need a
custom VJP).  See scripts/probe_layer1_pallas.py for the measured verdict.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fold_conv_bn", "fold_bottleneck_blocks", "bottleneck_chain_pallas",
           "bottleneck_chain_xla"]


def fold_conv_bn(kernel, scale, bias, mean, var, eps=1e-5):
    """Fold an inference BatchNorm into the preceding (bias-free) conv.

    kernel: [..., Cin, Cout] HWIO (or [Cin, Cout] for 1x1-as-matmul);
    returns (kernel', bias') with  BN(conv(x, k)) == conv(x, k') + b'.
    """
    inv = scale / jnp.sqrt(var + eps)
    return kernel * inv, bias - mean * inv


def _block_math(y, blk, hw, compute_dtype):
    """One folded Bottleneck on a [H, W, Cin] tile (shared by the Pallas
    kernel body and the XLA reference): 1x1 -> 3x3 (9 shifted matmuls on a
    zero-padded buffer) -> 1x1, plus the (optional 1x1-projected) residual."""
    h, w = hw
    cd = compute_dtype

    def mm(a, b):
        return jax.lax.dot_general(
            a.astype(cd), b.astype(cd), (((a.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    y2d = y.reshape(h * w, y.shape[-1])
    if blk.get("wd") is not None:
        identity = mm(y2d, blk["wd"]) + blk["bd"]
    else:
        identity = y2d.astype(jnp.float32)
    m = jnp.maximum(mm(y2d, blk["w1"]) + blk["b1"], 0.0)
    width = m.shape[-1]
    p = lax.pad(m.astype(cd).reshape(h, w, width), jnp.asarray(0.0, cd),
                ((1, 1, 0), (1, 1, 0), (0, 0, 0)))
    acc = jnp.zeros((h * w, width), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = lax.slice(p, (dy, dx, 0), (dy + h, dx + w, width))
            acc = acc + mm(tap.reshape(h * w, width), blk["w2"][dy, dx])
    m2 = jnp.maximum(acc + blk["b2"], 0.0)
    out = mm(m2, blk["w3"]) + blk["b3"]
    if blk.get("sf1") is not None:
        # SE gate (models/layers.SELayer, reference nets/commons.py:4-18):
        # global-mean pool -> fc1 -> relu -> fc2 -> sigmoid, applied to the
        # main path before the residual add.  All tiny [1, C] matmuls.
        v = jnp.mean(out, axis=0, keepdims=True)
        g = jnp.maximum(mm(v, blk["sf1"]) + blk["sb1"], 0.0)
        g = jax.nn.sigmoid(mm(g, blk["sf2"]) + blk["sb2"])
        out = out * g
    out = jnp.maximum(out + identity, 0.0)
    return out.reshape(h, w, out.shape[-1])


def _chain_kernel(x_ref, *refs, out_ref, specs, hw, compute_dtype):
    """refs: flat folded-weight refs; specs[i] maps block i -> its ref slots."""
    y = x_ref[0]
    it = iter(refs)
    for spec in specs:
        blk = {k: next(it)[...] for k in spec}
        y = _block_math(y, blk, hw, compute_dtype)
    out_ref[0] = y.astype(out_ref.dtype)


def _flatten_blocks(blocks):
    specs, flat = [], []
    for blk in blocks:
        keys = ["w1", "b1", "w2", "b2", "w3", "b3"]
        if blk.get("sf1") is not None:
            keys += ["sf1", "sb1", "sf2", "sb2"]
        if blk.get("wd") is not None:
            keys += ["wd", "bd"]
        specs.append(tuple(keys))
        flat.extend(blk[k] for k in keys)
    return tuple(specs), flat


def fold_bottleneck_blocks(params, batch_stats, block_names, *, eps=1e-5):
    """Fold a chain of eval-mode Bottleneck blocks (models/resnet.Bottleneck
    param layout: conv1/bn1, conv2/bn2, conv3/bn3, optional se.fc1/fc2 and
    downsample_conv/downsample_bn) into the dict format
    :func:`bottleneck_chain_pallas` consumes.

    :param params: the model's ``variables['params']`` subtree holding the
        blocks (e.g. the whole params dict; blocks addressed by name)
    :param batch_stats: matching ``variables['batch_stats']``
    :param block_names: chain order, e.g. ``['layer1_0', 'layer1_1', ...]``
    """
    blocks = []
    for name in block_names:
        p, s = params[name], batch_stats[name]
        blk = {}
        for i, (wk, bk) in enumerate((("w1", "b1"), ("w2", "b2"), ("w3", "b3")), 1):
            bn = p[f"bn{i}"]
            w, b = fold_conv_bn(p[f"conv{i}"]["kernel"], bn["scale"], bn["bias"],
                                s[f"bn{i}"]["mean"], s[f"bn{i}"]["var"], eps)
            if i != 2:  # 1x1 convs run as plain matmuls
                w = w.reshape(w.shape[-2], w.shape[-1])
            blk[wk], blk[bk] = w, b
        if "se" in p:
            blk["sf1"] = p["se"]["fc1"]["kernel"].reshape(
                p["se"]["fc1"]["kernel"].shape[-2], -1)
            blk["sb1"] = p["se"]["fc1"]["bias"]
            blk["sf2"] = p["se"]["fc2"]["kernel"].reshape(
                p["se"]["fc2"]["kernel"].shape[-2], -1)
            blk["sb2"] = p["se"]["fc2"]["bias"]
        if "downsample_conv" in p:
            bn = p["downsample_bn"]
            w, b = fold_conv_bn(p["downsample_conv"]["kernel"], bn["scale"], bn["bias"],
                                s["downsample_bn"]["mean"], s["downsample_bn"]["var"], eps)
            blk["wd"], blk["bd"] = w.reshape(w.shape[-2], w.shape[-1]), b
        else:
            blk["wd"] = None
        blocks.append(blk)
    return blocks


def bottleneck_chain_pallas(x, blocks: Sequence[dict], *,
                            compute_dtype=jnp.bfloat16, out_dtype=None,
                            interpret: bool = False):
    """Fused folded-Bottleneck chain.

    :param x: [B, H, W, C0] activations
    :param blocks: per-block dicts of folded weights:
        w1 [Cin, width], b1 [width], w2 [3, 3, width, width], b2 [width],
        w3 [width, Cout], b3 [Cout], and optionally wd [Cin, Cout], bd
        (the stage-leading downsample projection).  All stride 1.
    :returns: [B, H, W, Cout]
    """
    b, h, w, _ = x.shape
    out_ch = blocks[-1]["w3"].shape[-1]
    out_dtype = out_dtype or x.dtype
    specs, flat = _flatten_blocks(blocks)
    # biases participate in f32 adds; matmul operands in compute dtype
    flat = [a.astype(jnp.float32) if a.ndim == 1 else a.astype(compute_dtype)
            for a in flat]

    kernel = functools.partial(_chain_kernel, specs=specs, hw=(h, w),
                               compute_dtype=compute_dtype)

    def body(x_op, *w_ops):
        return pl.pallas_call(
            lambda x_ref, *rs: kernel(x_ref, *rs[:-1], out_ref=rs[-1]),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, h, w, x.shape[-1]), lambda i: (i, 0, 0, 0))]
            + [pl.BlockSpec(a.shape, functools.partial(lambda nd, i: (0,) * nd, a.ndim))
               for a in w_ops],
            out_specs=pl.BlockSpec((1, h, w, out_ch), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, h, w, out_ch), out_dtype),
            interpret=interpret,
        )(x_op, *w_ops)

    return body(x, *flat)


def bottleneck_chain_xla(x, blocks: Sequence[dict], *, compute_dtype=jnp.bfloat16):
    """Reference XLA lowering of the same folded math (what the eval graph
    does today, minus BN which XLA folds for free -- docs/PERF.md BN-fold
    probe).  Used for parity tests and the A/B probe."""
    h, w = x.shape[1:3]
    y = x
    for blk in blocks:
        y = _block_math(y, blk, (h, w), compute_dtype)[None] if y.ndim == 3 else jax.vmap(
            lambda t: _block_math(t, blk, (h, w), compute_dtype))(y)
    return y.astype(x.dtype)
