"""Model registry: the safe replacement for the reference's
``getattr(eval(cfg['type']), cfg['name'])`` reflection
(processors/dp_pose_resnet_solver.py:57-61).

Config schema mirrors the reference YAML ``model`` section:
  type: pose_resnet_dconv | pose_resnet_duc | pose_hrnet
  name: resnet18..resnet152 / resnext / wide_resnet (resnet types)
        w32 | w48 (hrnet)
  num_joints: 17
  reduction: bool (SE attention, resnet types only)
"""

from __future__ import annotations

from simple_pose_tpu.models.hrnet import build_hrnet
from simple_pose_tpu.models.resnet import RESNET_SPECS, build_resnet

__all__ = ["build_model", "MODEL_TYPES", "resolve_amp_dtype"]


def resolve_amp_dtype(amp):
    """'auto' -> bf16 compute on TPU, f32 elsewhere; True/False force it.

    Params always stay float32 (flax compute dtype only); the single source
    of the amp rule for pose models, detectors and eval workflows."""
    import jax
    import jax.numpy as jnp

    if amp == "auto":
        amp = jax.default_backend() == "tpu"
    return jnp.bfloat16 if amp else None

MODEL_TYPES = ("pose_resnet_dconv", "pose_resnet_duc", "pose_hrnet")


def build_model(model_type: str, name: str = "resnet50", num_joints: int = 17,
                reduction: bool = False, train: bool = False, dtype=None,
                remat: bool = False):
    """dtype: flax compute dtype (e.g. jnp.bfloat16 or the string
    'bfloat16'); params stay float32 (mixed precision).
    remat: jax.checkpoint each residual block (memory for FLOPs)."""
    if isinstance(dtype, str):
        import jax.numpy as jnp

        dtype = jnp.dtype(dtype)
    if model_type == "pose_resnet_dconv":
        return build_resnet(name, head="dconv", num_joints=num_joints, se=reduction, train=train,
                            dtype=dtype, remat=remat)
    if model_type == "pose_resnet_duc":
        return build_resnet(name, head="duc", num_joints=num_joints, se=reduction, train=train,
                            dtype=dtype, remat=remat)
    if model_type == "pose_hrnet":
        return build_hrnet(name, num_joints=num_joints, train=train, dtype=dtype, remat=remat)
    raise KeyError(f"unknown model type {model_type!r}; choose from {MODEL_TYPES} "
                   f"(resnet names: {sorted(RESNET_SPECS)})")


def build_from_cfg(model_cfg: dict, train: bool = False, dtype=None):
    return build_model(
        model_cfg["type"],
        name=model_cfg.get("name", "resnet50"),
        num_joints=model_cfg.get("num_joints", 17),
        reduction=model_cfg.get("reduction", False),
        train=train,
        dtype=dtype,
        remat=model_cfg.get("remat", False),
    )
