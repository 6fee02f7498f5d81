"""AOT serving export: serialize the jitted eval program via ``jax.export``.

The reference deploys by re-creating the model class in a Python process and
loading a torch checkpoint (``/root/reference/eval.py:203-262``).  TPU-first
serving inverts that: lower the whole program once and ship the artifact.
``jax.export`` lowers the entire :class:`~simple_pose_tpu.evalkit.workflows.
PoseEvaluator` step -- device crop -> forward -> optional flip-test -> decode
-- to a versioned, platform-checked StableHLO blob; a server needs only jax
and the artifact (no model code, no checkpoint plumbing, no config files).

* ``bake_weights=True`` (default) embeds the parameters as program constants:
  one self-contained file per model (~4 bytes/param: the stored params are
  f32 even in bf16-compute configs; resnet18 ≈ 64 MB measured).
* ``bake_weights=False`` keeps the variables pytree as the first runtime
  argument, so one program can serve many checkpoints of the same topology.

Exported signature (the evaluator's exact device contract):

    (canvas u8[B,H,W,3], trans f32[B,2,3], trans_inv f32[B,2,3]) -> dict

with the same outputs as ``PoseEvaluator.__call__``: ``kps/conf/scores`` for
the jitted decoders, or ``heat`` for ``decoder='dark_original'`` whose final
Newton refinement is host-side numpy (apply
``ops.decode.decode_dark_original`` to the result, as workflows.py does).

Cross-platform: ``platforms=("tpu", "cpu")`` lowers both, so one artifact can
serve a v5e fleet and a CPU canary.  Multi-chip serving replicates the
artifact per chip (pose eval is batch-parallel with no cross-chip
collectives); exporting a mesh-sharded evaluator is refused explicitly
rather than silently pinning a slice-wide program to one device.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "export_evaluator",
    "export_fused",
    "save_exported",
    "load_exported",
    "serving_fn",
]


def export_evaluator(evaluator, batch_size, canvas_hw,
                     *, bake_weights: bool = True,
                     platforms: Optional[Sequence[str]] = None):
    """Lower a PoseEvaluator's jitted step to a ``jax.export.Exported``.

    :param evaluator: a single-device PoseEvaluator (mesh=None); its decoder,
        flip-test, and amp choices are already baked into ``_step``.
    :param batch_size: static crop-batch size of the exported program, or a
        symbolic-dimension name (any non-numeric string, e.g. ``"b"``) for a
        batch-polymorphic artifact that serves every batch size from one
        file.  The whole eval chain is batch-elementwise (einsum crop,
        convs, per-sample decode), so polymorphism costs nothing at trace
        time; the serving runtime still specializes/compiles per distinct
        batch it sees, so servers with a fixed batch should prefer a static
        export (no first-request compile beyond the one shape).
    :param canvas_hw: static (height, width) of the input canvases.
    :param bake_weights: embed ``evaluator.variables`` as constants (default)
        or keep them as the leading runtime argument.
    :param platforms: lowering platforms, e.g. ``("tpu", "cpu")``; default is
        the current backend only.
    """
    if evaluator.mesh is not None:
        raise ValueError(
            "export_evaluator requires a single-device evaluator (mesh=None); "
            "serve a slice by replicating the artifact per chip")
    from jax import export as jax_export

    if isinstance(batch_size, str):
        (batch_size,) = jax_export.symbolic_shape(batch_size)
    h, w = canvas_hw
    canvas_sd = jax.ShapeDtypeStruct((batch_size, h, w, 3), jnp.uint8)
    trans_sd = jax.ShapeDtypeStruct((batch_size, 2, 3), jnp.float32)
    step, variables = evaluator._step, evaluator.variables
    folded = evaluator._layer1_folded
    if folded is not None and not bake_weights:
        raise ValueError(
            "fused_layer1 folds weights at evaluator build time, so an "
            "external-weights export would silently ignore swapped-in layer1 "
            "weights; use bake_weights=True or fused_layer1=False")

    if bake_weights:
        fn = jax.jit(lambda canvas, trans, trans_inv: step(
            variables, folded,
            {"canvas": canvas, "trans": trans, "trans_inv": trans_inv}))
        args = (canvas_sd, trans_sd, trans_sd)
    else:
        fn = jax.jit(lambda v, canvas, trans, trans_inv: step(
            v, folded, {"canvas": canvas, "trans": trans, "trans_inv": trans_inv}))
        vars_sd = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                               variables)
        args = (vars_sd, canvas_sd, trans_sd, trans_sd)

    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(fn, **kwargs)(*args)


def export_fused(fused, batch_size: int, canvas: int,
                 *, platforms: Optional[Sequence[str]] = None):
    """Lower a FusedDetectPose program (detect -> NMS -> crop -> pose ->
    decode, one device program) to a ``jax.export.Exported``.

    Both networks' weights are baked in.  The exported signature is the
    fused program's device contract minus the variable trees:

        (canvases u8[B,canvas,canvas,3], lb_trans f32[B,2,3],
         lb_region f32[B,4], lb_inv_scale f32[B], lb_offset f32[B,2]) -> dict

    The letterbox geometry args are host-side numpy
    (``FusedDetectPose.host_prep``); a server reuses that helper (or its
    ~15 lines of geometry) for preprocessing, the same way it already owns
    image decode.  Exports the default det_size program (rect buckets are
    separate static shapes -- export one artifact per bucket if needed).
    """
    if fused.mesh is not None:
        raise ValueError(
            "export_fused requires a single-device program (mesh=None); "
            "serve a slice by replicating the artifact per chip")
    from jax import export as jax_export

    b = batch_size
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)
    det_vars, pose_vars = fused.detector.variables, fused.pose_vars
    program = fused._program

    fn = jax.jit(lambda canvases, lb_trans, lb_region, lb_inv_scale, lb_offset:
                 program(det_vars, pose_vars, canvases, lb_trans, lb_region,
                         lb_inv_scale, lb_offset))
    args = (sds((b, canvas, canvas, 3), jnp.uint8),
            sds((b, 2, 3), jnp.float32), sds((b, 4), jnp.float32),
            sds((b,), jnp.float32), sds((b, 2), jnp.float32))
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(fn, **kwargs)(*args)


def save_exported(exported, path: str) -> int:
    """Serialize an Exported to ``path``; returns the byte count."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path_or_bytes):
    """Deserialize a ``jax.export.Exported`` from a file path or raw bytes."""
    from jax import export as jax_export

    if isinstance(path_or_bytes, (bytes, bytearray)):
        blob = bytes(path_or_bytes)
    else:
        with open(os.fspath(path_or_bytes), "rb") as f:
            blob = f.read()
    return jax_export.deserialize(blob)


def serving_fn(path_or_bytes):
    """Load an artifact and return the jit-compiled serving callable.

    The callable has the exported signature (``(canvas, trans, trans_inv)``,
    preceded by the variables pytree for ``bake_weights=False`` artifacts)
    and returns the evaluator's output dict.
    """
    return jax.jit(load_exported(path_or_bytes).call)
