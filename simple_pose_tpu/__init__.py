"""simple_pose_tpu: a TPU-native top-down 2D human pose estimation framework.

Re-designed from scratch for JAX/XLA/Pallas/pjit with the capabilities of the
reference framework (liangheming/simple_pose): SimpleBaselines (deconv head),
FastPose/AlphaPose (DUC pixel-shuffle head), HRNet W32/W48, DarkPose
encode/decode, SPMD data-parallel training over a jax.sharding.Mesh, and a
YOLOv5/YOLOv4 person detector front-end for end-to-end detect->crop->pose.

Architecture stance (TPU-first, not a port):
  * All per-crop math (affine crop, augmentation, heatmap target encoding,
    sub-pixel decoding) runs on-device inside one jitted SPMD program; the
    host only decodes JPEGs and computes tiny 2x3 matrices.
  * DP/DDP/SyncBN collapse into a single pjit code path: the batch axis is
    sharded over a Mesh('data'), so BatchNorm statistics and gradient means
    are global automatically (XLA inserts the collectives over ICI).
  * bf16 compute on the MXU replaces AMP GradScaler (no loss scaling needed).
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS even on platform plugins that override it after env
# parsing (observed with tunneled TPU runtimes): re-assert the user's choice
# through jax.config before any backend initializes.
import os as _os

if "JAX_PLATFORMS" in _os.environ:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:  # already initialized or unknown platform: leave as-is
        pass
