"""Probe: XLA formulations of the crop's stage-1 resample at canvas 640.

PROBE_STAGE1_BAND.json showed stage-1 collapsing 3.31 -> 1.40 ms when the
source extent shrinks 640 -> 512 -- far beyond FLOP proportionality, so the
cost at 640 is strategy/layout, not arithmetic.  Before reaching for a
Pallas kernel, try pure-XLA reformulations of the same two contractions
(all mathematically identical: 2-tap rows make every variant's f32
accumulation exact per term):

  current   einsum boh,bhwc->bowc then bxw,bowc->boxc  (ops/warp.py)
  xfirst    contract x first, then y
  chmajor   channel-major operand: boh,bchw->bcow then bxw,bcow->bcox
            (emits [B,C,inter,inter] directly -- also removes the NHWC->NCHW
            transpose the Pallas stage-2 needs afterwards)
  chpad     chmajor with the x one-hot padded to 384 rows: the lane padding
            stage-2 wants comes out of the matmul for free
  splitk    current with the h-contraction split into two 320-chunks
            (2-tap rows make the split exact; probes a K=640 cliff)

Chained-fori_loop timing, iters >= 300 (docs/PERF.md tunnel-dispatch rule).

    python scripts/probe_stage1_form.py [--iters 300 --batch 128]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/simple_pose_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simple_pose_tpu.ops.warp import _interp_matrix

    b, inter, src = args.batch, 328, 640
    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 255, (b, src, src, 3), dtype=np.uint8))
    canvas_cm = jnp.asarray(np.moveaxis(np.asarray(canvas), -1, 1))  # [B,3,H,W]
    d = jnp.asarray(rng.uniform(0.8, 1.7, (b,)), jnp.float32)

    def mats(tt):
        ry = _interp_matrix(tt, d, inter, src).astype(jnp.bfloat16)
        cx = _interp_matrix(tt, d, inter, src).astype(jnp.bfloat16)
        return ry, cx

    def current(img, tt):
        ry, cx = mats(tt)
        x = img.astype(jnp.bfloat16)
        tmp = jnp.einsum("boh,bhwc->bowc", ry, x, preferred_element_type=jnp.float32)
        return jnp.einsum("bxw,bowc->boxc", cx, tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def xfirst(img, tt):
        ry, cx = mats(tt)
        x = img.astype(jnp.bfloat16)
        tmp = jnp.einsum("bxw,bhwc->bhxc", cx, x, preferred_element_type=jnp.float32)
        return jnp.einsum("boh,bhxc->boxc", ry, tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def chmajor(img_cm, tt):
        ry, cx = mats(tt)
        x = img_cm.astype(jnp.bfloat16)
        tmp = jnp.einsum("boh,bchw->bcow", ry, x, preferred_element_type=jnp.float32)
        return jnp.einsum("bxw,bcow->bcox", cx, tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def chpad(img_cm, tt):
        ry, cx = mats(tt)
        cx = jnp.pad(cx, ((0, 0), (0, 384 - inter), (0, 0)))
        x = img_cm.astype(jnp.bfloat16)
        tmp = jnp.einsum("boh,bchw->bcow", ry, x, preferred_element_type=jnp.float32)
        return jnp.einsum("bxw,bcow->bcox", cx, tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    def splitk(img, tt):
        ry, cx = mats(tt)
        x = img.astype(jnp.bfloat16)
        tmp = sum(
            jnp.einsum("boh,bhwc->bowc", ry[:, :, lo:hi], x[:, lo:hi],
                       preferred_element_type=jnp.float32)
            for lo, hi in ((0, 320), (320, 640))
        )
        return jnp.einsum("bxw,bowc->boxc", cx, tmp.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)

    variants = {
        "current": (current, canvas),
        "xfirst": (xfirst, canvas),
        "chmajor": (chmajor, canvas_cm),
        "chpad": (chpad, canvas_cm),
        "splitk": (splitk, canvas),
    }
    results = {}
    for name, (fn, img) in variants.items():
        def step(carry, fn=fn, img=img):
            acc, i = carry
            tt = 1.0 + acc * 1e-30 + i.astype(jnp.float32) * 1e-3
            out = fn(img, jnp.full((b,), tt))
            sl = out[:, ::82] if out.ndim == 3 else out[..., ::82, ::82]
            return (jnp.sum(sl) * 1e-12, i + 1)

        @jax.jit
        def run():
            return jax.lax.fori_loop(
                0, args.iters, lambda i, c: step(c), (jnp.zeros(()), jnp.zeros((), jnp.int32))
            )

        acc, _ = run()
        float(acc)
        t0 = time.perf_counter()
        acc, _ = run()
        float(acc)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        results[name] = round(ms, 4)
        print(json.dumps({"variant": name, "ms_per_iter": round(ms, 4)}), flush=True)

    results.update(batch=b, iters=args.iters, backend=jax.default_backend())
    with open("PROBE_STAGE1_FORM.json", "w") as f:
        json.dump(results, f)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
