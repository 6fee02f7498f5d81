"""Pallas TPU kernel for the rotation stage of the affine crop.

The XLA formulation of stage 2 (ops/warp.py affine_crop_mxu) materializes the
one-hot interpolation matrices and the [band, q] partial product in HBM --
tens of GB of traffic per 128-crop batch.  This kernel fuses the whole stage
in VMEM: per (sample, output-row-block) grid step it

  1. reads the sample's intermediate patch [inter, inter, C] (kept resident
     across the inner row-block grid dimension -- the index map only changes
     with the sample index, so Mosaic skips redundant copies),
  2. computes the block's u = R x + u0 coordinates from SMEM scalars,
  3. builds the x-tap one-hot V^T [inter, q] and the y-tap one-hot
     U^T [band, q] with broadcasted-iota compares (VPU),
  4. slices a [band, inter] row band out of the patch (dynamic, per block)
     and contracts P_c = I_band_c @ V^T on the MXU,
  5. reduces out_c[q] = sum_h U^T * P_c on the VPU and writes the
     [row_block, ow, C] output block.

Banding exploits |R10| <= sin(max_rot): a row_block-tall output block only
touches sin(max_rot)*ow + row_block + ~4 source rows (training augmentation
is +-40 deg).  All taps are in-bounds by construction of u0 (ops/warp.py).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from simple_pose_tpu.ops.warp import decompose_affine, stage1_resample

__all__ = ["affine_crop_pallas", "rotate_resample_pallas"]


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _stage2_kernel(scalars_ref, inter_ref, out_ref, *, inter, band, row_block, cw, channels,
                   xw=None):
    """scalars_ref: [B, 8] scalar-prefetch (r00, r01, r10, r11, u0x, u0y, _, _)
    inter_ref: [1, C, inter, inter_pad] VMEM (one sample's patch, channel-
        major: C must NOT be the lane dim or tiling pads 3 channels to 128
        lanes; the lane dim may carry explicit zero padding for x-banding)
    out_ref: [1, 1, 1, C, q] VMEM

    The grid tiles the output in (row_block x cw) blocks.  Narrower column
    blocks shrink the y-band (the rotation sweep |r10|*cw across a block) --
    at cw=96 the band roughly halves vs full-row blocks, cutting the
    dominant [band, inter] @ [inter, q] contraction FLOPs ~40% with
    bit-identical output (rows outside the 2-tap hat support contribute
    exact f32 zeros, so banding never changes the sum).

    xw: optional x-band width (lanes).  The x-window of one block is only
    ~cw + sin_max*row_block + 2 taps wide, so the contraction can slice a
    128-aligned xw-lane window instead of all inter_pad lanes -- Mosaic
    needs lane slices 128-aligned, hence the explicit zero pad of the lane
    dim (zero taps have zero hat weights: bit-identical, same argument as
    the column blocking).
    """
    bi = pl.program_id(0)
    blk = pl.program_id(1)
    cblk = pl.program_id(2)
    r00 = scalars_ref[bi, 0]
    r01 = scalars_ref[bi, 1]
    r10 = scalars_ref[bi, 2]
    r11 = scalars_ref[bi, 3]
    u0x = scalars_ref[bi, 4]
    u0y = scalars_ref[bi, 5]

    q = row_block * cw
    y0 = (blk * row_block).astype(jnp.float32)
    x0 = (cblk * cw).astype(jnp.float32)
    # block pixel grid directly in flat [1, q] lane layout (Mosaic cannot
    # reshape across lanes): row = qi // cw, col = qi % cw
    qi = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1)
    rows = (qi // cw).astype(jnp.float32) + y0
    cols = (qi % cw).astype(jnp.float32) + x0
    ux = r00 * cols + r01 * rows + u0x  # [1, q]
    uy = r10 * cols + r11 * rows + u0y

    # dynamic band start (relative y taps); in-bounds by u0 construction.
    # Rounded down to a sublane multiple (8) for the aligned VMEM slice.
    band_start = jnp.clip(jnp.floor(jnp.min(uy)) - 1.0, 0.0, float(inter - band)).astype(jnp.int32)
    band_start = pl.multiple_of((band_start // 8) * 8, 8)

    inter_pad = inter_ref.shape[-1]
    if xw is None or xw >= inter_pad:
        xw_eff, x_start = inter_pad, None
    else:
        # 128-aligned lane window; worst case the window starts just below
        # the alignment boundary, so xw must cover ~128 + window (the
        # caller guarantees xw >= 128 + x-window width)
        xw_eff = xw
        x_start = jnp.clip(jnp.floor(jnp.min(ux)) - 1.0, 0.0,
                           float(inter_pad - xw)).astype(jnp.int32)
        x_start = pl.multiple_of((x_start // 128) * 128, 128)

    # bilinear weights as hat functions: weight(s) = max(0, 1 - |s - u|)
    # (exactly the 2-tap one-hot rows, built in one VPU op chain)
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (xw_eff, q), 0).astype(jnp.float32)
    if x_start is not None:
        w_iota = w_iota + x_start.astype(jnp.float32)
    v_t = jnp.maximum(0.0, 1.0 - jnp.abs(w_iota - ux)).astype(jnp.bfloat16)

    h_iota = jax.lax.broadcasted_iota(jnp.int32, (band, q), 0).astype(jnp.float32) + band_start.astype(jnp.float32)
    u_t = jnp.maximum(0.0, 1.0 - jnp.abs(h_iota - uy))

    for ci in range(channels):
        if x_start is None:
            i_band = inter_ref[0, ci, pl.ds(band_start, band), :]  # [band, inter_pad] bf16
        else:
            i_band = inter_ref[0, ci, pl.ds(band_start, band), pl.ds(x_start, xw_eff)]
        p_c = jnp.dot(i_band, v_t, preferred_element_type=jnp.float32)  # [band, q]
        out_c = jnp.sum(u_t * p_c, axis=0, keepdims=True)  # [1, q]
        # the accumulate stays f32; a bf16 out_ref just narrows the write
        out_ref[0, 0, 0, ci, :] = out_c[0].astype(out_ref.dtype)


def rotate_resample_pallas(inter_img, r_mat, u0, out_hw, band, row_block=8, col_block=None,
                           out_dtype=jnp.float32, x_band=None):
    """Stage-2 rotation resample: [B, C, inter, inter_pad] -> [B, oh, ow, C].

    band must cover the rotation sweep of one (row_block x col_block) output
    block (computed by the caller from col_block).  out_dtype narrows only
    the final VMEM->HBM write (accumulation is f32).  x_band slices a
    128-aligned lane window of that width out of the contraction (requires
    the caller to have zero-padded the lane dim to a 128 multiple)."""
    b, c, inter, inter_pad = inter_img.shape
    oh, ow = out_hw
    cw = ow if col_block is None else col_block
    assert oh % row_block == 0 and ow % cw == 0
    scalars = jnp.concatenate(
        [r_mat.reshape(b, 4), u0, jnp.zeros((b, 2), jnp.float32)], axis=-1
    )  # [B, 8]
    n_blocks = oh // row_block
    n_cblocks = ow // cw
    q = row_block * cw
    kernel = functools.partial(
        _stage2_kernel, inter=inter, band=band, row_block=row_block, cw=cw, channels=c,
        xw=x_band,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_blocks, n_cblocks),
        in_specs=[
            pl.BlockSpec((1, c, inter, inter_pad), lambda i, j, k, s: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, c, q), lambda i, j, k, s: (i, j, k, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_blocks, n_cblocks, c, q), out_dtype),
    )(scalars, inter_img)
    # [B, n_blocks, n_cblocks, C, row_block*cw] -> [B, oh, ow, C]
    out = out.reshape(b, n_blocks, n_cblocks, c, row_block, cw)
    return out.transpose(0, 1, 4, 2, 5, 3).reshape(b, oh, ow, c)


def affine_crop_pallas(images, trans, out_hw, inter: int = 328, row_block: int = 8,
                       max_rot_deg: float = 41.0, col_block: int = 96,
                       out_dtype=jnp.float32):
    """Two-stage batched affine crop with the Pallas stage-2 kernel.

    Same semantics as affine_crop_mxu (training-augmentation warp); requires
    the affine's rotation component to stay within +-max_rot_deg (the
    reference augments within +-40, commons/transforms.py:205).

    col_block tiles output rows into column blocks: the y-band scales with
    the block width (sin_max * cw), so cw=96 nearly halves the stage-2
    contraction FLOPs at ow=192 vs full-row blocks, bit-identically (see
    _stage2_kernel).  Widths that don't divide ow fall back to full rows.
    """
    b, h, w, c = images.shape
    oh, ow = out_hw
    assert (oh**2 + ow**2) ** 0.5 <= inter - 4
    cw = col_block if (col_block and ow % col_block == 0) else ow
    d0, d1, r_mat, u0, t1x, t1y = decompose_affine(trans, out_hw, inter)
    inter_img = stage1_resample(images, d0, d1, t1x, t1y, inter)
    inter_img = inter_img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # channel-major bf16
    sin_max = min(1.0, abs(math.sin(math.radians(min(max_rot_deg, 90.0)))) + 1e-3)
    # +8 covers the sublane round-down of the dynamic band start
    band = min(inter, _round_up(int(np.ceil(sin_max * cw)) + row_block + 6 + 8, 8))
    # x-banding: one block's x-window is ~cos*cw + sin*row_block + 4 taps;
    # the 128-aligned slice start can sit up to 127 lanes below it, so the
    # window width is 128 + that, rounded up to a lane multiple.  Zero-pad
    # the lane dim so the slice is always in-bounds (padded taps carry
    # exactly-zero hat weights -> bit-identical, like the column blocking).
    x_window = int(np.ceil(cw + sin_max * row_block)) + 6
    x_band = _round_up(128 + x_window, 128)
    inter_pad = _round_up(inter, 128)
    if x_band < inter_pad:
        inter_img = jnp.pad(inter_img, ((0, 0), (0, 0), (0, 0), (0, inter_pad - inter)))
    else:
        x_band = None
    return rotate_resample_pallas(inter_img, r_mat, u0, out_hw, band, row_block, cw,
                                  out_dtype=out_dtype, x_band=x_band)
