"""Pallas stage-2 warp kernel vs the XLA one-hot path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_pose_tpu.ops import affine as A
from simple_pose_tpu.ops.warp import affine_crop_mxu


@pytest.fixture()
def interpret_pallas(monkeypatch):
    from jax.experimental import pallas as pl

    import simple_pose_tpu.ops.pallas_warp as PW

    orig = pl.pallas_call
    monkeypatch.setattr(PW.pl, "pallas_call", lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
    return PW


def _mk_trans(rng, rot):
    c = rng.uniform(150, 450, 2)
    w_ = rng.uniform(60, 300)
    s = np.array([w_, w_ * 256 / 192]) * 1.25
    t, _ = A.get_affine_transform(c, s, rot, (192, 256))
    return t.astype(np.float32)


def test_pallas_matches_xla_mxu(interpret_pallas):
    rng = np.random.default_rng(0)
    imgs = np.stack(
        [np.clip(np.kron(rng.uniform(0, 255, (40, 40, 3)), np.ones((8, 8, 1))), 0, 255).astype(np.uint8)
         for _ in range(2)]
    )
    tr = np.stack([_mk_trans(rng, rng.uniform(-40, 40)) for _ in range(2)])
    xla = np.asarray(affine_crop_mxu(jnp.asarray(imgs), jnp.asarray(tr), (256, 192)))
    pls = np.asarray(
        interpret_pallas.affine_crop_pallas(jnp.asarray(imgs), jnp.asarray(tr), (256, 192))
    )
    # identical math modulo bf16 summation order
    assert np.abs(pls - xla).mean() < 0.2
    assert np.abs(pls - xla).max() < 3.0


def test_pallas_axis_aligned(interpret_pallas):
    rng = np.random.default_rng(1)
    imgs = np.stack([rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)])
    tr = np.stack([_mk_trans(rng, 0.0)])
    xla = np.asarray(affine_crop_mxu(jnp.asarray(imgs), jnp.asarray(tr), (256, 192)))
    pls = np.asarray(
        interpret_pallas.affine_crop_pallas(jnp.asarray(imgs), jnp.asarray(tr), (256, 192))
    )
    assert np.abs(pls - xla).max() < 3.0


def test_pallas_col_block_bit_exact(interpret_pallas):
    """Column blocking (cw=96 vs full-row cw=192) must be BIT-identical:
    the narrower y-band only drops rows whose hat weights are exactly 0.0,
    and f32 adds of 0.0 never change the sum."""
    rng = np.random.default_rng(2)
    imgs = np.stack([rng.integers(0, 255, (512, 512, 3), dtype=np.uint8) for _ in range(2)])
    tr = np.stack([_mk_trans(rng, r) for r in (-40.0, 27.5)])
    full = np.asarray(interpret_pallas.affine_crop_pallas(
        jnp.asarray(imgs), jnp.asarray(tr), (256, 192), col_block=0))
    blocked = np.asarray(interpret_pallas.affine_crop_pallas(
        jnp.asarray(imgs), jnp.asarray(tr), (256, 192), col_block=96))
    assert np.array_equal(full, blocked)


def test_pallas_fuzz_vs_mxu(interpret_pallas):
    """Property fuzz: random rotations up to the +-40.99 deg band edge,
    random scales/centers, must track the XLA MXU formulation everywhere
    (incl. each crop's extreme rows/columns, where a band-undersize bug
    would surface first)."""
    rng = np.random.default_rng(7)
    imgs = np.stack([
        np.clip(np.kron(rng.uniform(0, 255, (64, 64, 3)), np.ones((8, 8, 1))), 0, 255)
        .astype(np.uint8) for _ in range(6)
    ])
    rots = np.array([-40.99, 40.99, -39.5, 12.3, -0.01, 33.3])
    tr = np.stack([_mk_trans(rng, r) for r in rots])
    xla = np.asarray(affine_crop_mxu(jnp.asarray(imgs), jnp.asarray(tr), (256, 192)))
    pls = np.asarray(
        interpret_pallas.affine_crop_pallas(jnp.asarray(imgs), jnp.asarray(tr), (256, 192))
    )
    assert np.abs(pls - xla).mean() < 0.2
    assert np.abs(pls - xla).max() < 3.0
    # band edges: the first/last rows and columns of every crop
    edges = np.concatenate([
        (pls - xla)[:, :2].ravel(), (pls - xla)[:, -2:].ravel(),
        (pls - xla)[:, :, :2].ravel(), (pls - xla)[:, :, -2:].ravel(),
    ])
    assert np.abs(edges).max() < 3.0


def test_pallas_bf16_out_equals_f32_cast(interpret_pallas):
    """out_dtype=bfloat16 narrows only the final write: results must equal
    the f32 output rounded to bf16 (accumulation unchanged)."""
    rng = np.random.default_rng(5)
    imgs = np.stack([rng.integers(0, 255, (320, 320, 3), dtype=np.uint8) for _ in range(2)])
    tr = np.stack([_mk_trans(rng, rng.uniform(-40, 40)) for _ in range(2)])
    f32 = interpret_pallas.affine_crop_pallas(jnp.asarray(imgs), jnp.asarray(tr), (256, 192))
    b16 = interpret_pallas.affine_crop_pallas(jnp.asarray(imgs), jnp.asarray(tr), (256, 192),
                                              out_dtype=jnp.bfloat16)
    assert b16.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(b16), np.asarray(f32.astype(jnp.bfloat16)))


def test_pallas_x_band_bit_exact(interpret_pallas):
    """x-banding (the 128-aligned 256-lane contraction window) must be
    BIT-identical to the unbanded contraction: padded/out-of-window taps
    carry exactly-zero hat weights, and f32 adds of 0.0 never change the
    sum.  col_block=0 (full rows) disables x-banding, col_block=96 enables
    it at x_band=256; both orderings of the remaining terms are identical
    because zero terms drop out exactly."""
    import simple_pose_tpu.ops.pallas_warp as PW

    rng = np.random.default_rng(7)
    imgs = np.stack([rng.integers(0, 255, (512, 512, 3), dtype=np.uint8) for _ in range(2)])
    tr = np.stack([_mk_trans(rng, r) for r in (40.0, -13.0)])
    # direct rotate_resample comparison at identical cw, x_band on/off
    import math

    d0, d1, r_mat, u0, t1x, t1y = PW.decompose_affine(jnp.asarray(tr), (256, 192), 328)
    inter_img = PW.stage1_resample(jnp.asarray(imgs).astype(jnp.float32), d0, d1, t1x, t1y, 328)
    inter_img = inter_img.transpose(0, 3, 1, 2).astype(jnp.bfloat16)
    padded = jnp.pad(inter_img, ((0, 0), (0, 0), (0, 0), (0, 384 - 328)))
    band = 112
    off = np.asarray(interpret_pallas.rotate_resample_pallas(
        inter_img, r_mat, u0, (256, 192), band, 8, 96, x_band=None))
    on = np.asarray(interpret_pallas.rotate_resample_pallas(
        padded, r_mat, u0, (256, 192), band, 8, 96, x_band=256))
    assert np.array_equal(off, on)
