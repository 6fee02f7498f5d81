"""W8A8 post-training quantization for eval/serving (int8 on the MXU).

The v5e MXU rates int8 at 2x bf16 (394 TOPS vs 197 TFLOPS) and int8
activations halve conv HBM traffic, so a quantized eval path wins whether a
model is compute- or bandwidth-bound.  The reference has no quantized mode;
this is a serving extra over it.

Design (idiomatic JAX -- no model or checkpoint changes): a flax *method
interceptor* swaps every ``nn.Conv.__call__`` for a quantized forward while
the stored float parameters stay untouched:

    s_w[o] = max|W[:, :, :, o]| / 127          per-output-channel, symmetric
    W8     = round(W / s_w)        int8        (in-graph: XLA constant-folds
                                                it, so a baked jax.export
                                                artifact carries int8 weights)
    s_x    = max|x| / 127                      per-tensor, dynamic
    x8     = clip(round(x / s_x))  int8
    y      = conv(x8, W8) [int32 accumulate] * (s_x * s_w)  (+ bias)

BatchNorm, activations, the deconv/DUC heads, and the decoders stay in the
surrounding float dtype, which bounds the quantization error to the conv
stack.  Use via ``PoseEvaluator(..., quant='w8a8')`` or directly:

    with quantized('w8a8'):
        y = model.apply(variables, x)
"""

from __future__ import annotations

import contextlib

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

__all__ = ["quantized", "calibrate_w8a8", "ScaleRecorder",
           "allreduce_scales_max", "save_scales", "load_scales",
           "QUANT_MODES"]

QUANT_MODES = (None, "w8a8")


def _seq2(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _w8a8_conv(module: nn.Conv, x, act_scales=None):
    """Quantized replacement for a bound nn.Conv's forward."""
    w = module.get_variable("params", "kernel").astype(jnp.float32)
    s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-8)
    w8 = jnp.round(w / s_w).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    static = act_scales.get("/".join(module.path)) if act_scales else None
    if static is not None:
        # calibrated scale: a compile-time constant, so the dynamic
        # max-reduce over the activations disappears from the graph
        s_x = jnp.float32(static)
    else:
        s_x = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
    x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)

    padding = module.padding
    if not isinstance(padding, str):
        padding = tuple((int(lo), int(hi)) for lo, hi in padding)
    y = lax.conv_general_dilated(
        x8, w8,
        window_strides=_seq2(module.strides),
        padding=padding,
        rhs_dilation=_seq2(module.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=module.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (s_x * s_w)
    if module.use_bias:
        out = out + module.get_variable("params", "bias").astype(jnp.float32)
    return out.astype(module.dtype or x.dtype)


def _is_quantizable_conv(context) -> bool:
    m = context.module
    return (context.method_name == "__call__" and type(m) is nn.Conv
            and m.has_variable("params", "kernel"))


def quantized(mode, act_scales=None):
    """Context manager activating a quantization mode for model.apply.

    mode=None is a no-op (so call sites can pass the config value through);
    'w8a8' intercepts every nn.Conv as documented above.

    act_scales: optional {module-path: s_x} dict from :func:`calibrate_w8a8`.
    Convs with a calibrated entry use it as a compile-time constant (no
    dynamic max-reduce over the activations); others stay dynamic.
    """
    if mode is None:
        return contextlib.nullcontext()
    if mode == "w8a8":
        def interceptor(next_fun, args, kwargs, context):
            if _is_quantizable_conv(context):
                return _w8a8_conv(context.module, args[0], act_scales)
            return next_fun(*args, **kwargs)

        return nn.intercept_methods(interceptor)
    raise ValueError(f"unknown quant mode {mode!r}; expected one of {QUANT_MODES}")


class ScaleRecorder:
    """Reusable activation-max recorder for w8a8 calibration.

    Use as a context manager around UN-jitted float forwards (the recorder
    reads concrete values); each entered scope records max|activation| per
    conv module path into the same instance, so one recorder can span
    several model applies (e.g. the flipped forward, or every batch of a
    calibration sweep).  ``scales()`` converts the maxes to the {path: s_x}
    dict ``quantized('w8a8', act_scales=...)`` consumes.
    """

    def __init__(self):
        self.maxes: dict = {}

    def _recorder(self, next_fun, args, kwargs, context):
        if _is_quantizable_conv(context):
            key = "/".join(context.module.path)
            amax = float(jnp.max(jnp.abs(args[0])))
            self.maxes[key] = max(self.maxes.get(key, 0.0), amax)
        return next_fun(*args, **kwargs)

    def __enter__(self):
        self._ctx = nn.intercept_methods(self._recorder)
        self._ctx.__enter__()
        return self

    def __exit__(self, *exc):
        return self._ctx.__exit__(*exc)

    def scales(self) -> dict:
        if not self.maxes:
            raise ValueError("ScaleRecorder saw no conv activations; was the "
                             "forward run inside the recorder context?")
        return {k: max(v / 127.0, 1e-8) for k, v in self.maxes.items()}


def calibrate_w8a8(apply_fn, inputs):
    """Record per-conv activation scales over calibration inputs.

    Runs ``apply_fn(x)`` (UN-jitted -- the recorder reads concrete values)
    for each x in ``inputs`` with a float forward, recording
    max|activation| per conv module path.  Returns {path: s_x} for
    ``quantized('w8a8', act_scales=...)``.
    """
    rec = ScaleRecorder()
    with rec:
        for x in inputs:
            apply_fn(x)
    return rec.scales()


def allreduce_scales_max(scales: dict) -> dict:
    """Max-reduce calibrated scales across processes so every host of a
    multi-host run traces the identical SPMD program.  No-op single-host."""
    import jax

    if jax.process_count() <= 1:
        return scales
    import numpy as np
    from jax.experimental import multihost_utils as mhu

    keys = sorted(scales)
    gathered = np.asarray(mhu.process_allgather(
        np.array([scales[k] for k in keys], np.float32)))
    return {k: float(v)
            for k, v in zip(keys, gathered.reshape(-1, len(keys)).max(0))}


def save_scales(scales: dict, path: str) -> None:
    """Persist calibrated {conv-path: s_x} scales as JSON (the portable
    companion of a jax.export serving artifact: calibrate once on val data,
    export a fully static int8 program anywhere)."""
    import json

    with open(path, "w") as f:
        json.dump({k: float(v) for k, v in scales.items()}, f, indent=1)


def load_scales(path: str) -> dict:
    """Load scales written by :func:`save_scales`."""
    import json

    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}
