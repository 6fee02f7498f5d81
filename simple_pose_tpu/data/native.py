"""ctypes binding for the native canvas loader (native/canvas_loader.cc).

Auto-builds the shared library with g++/libjpeg on first use (cached next to
the source); if the toolchain or libjpeg is unavailable the pipeline falls
back to the cv2 path transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

__all__ = ["NativeCanvasLoader", "native_available"]

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcanvas_loader.so")
_build_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _build_lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_SO_PATH) or (
                os.path.getmtime(_SO_PATH) < os.path.getmtime(os.path.join(_NATIVE_DIR, "canvas_loader.cc"))
            ):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True, capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.cl_create.restype = ctypes.c_void_p
            lib.cl_create.argtypes = [ctypes.c_int]
            lib.cl_destroy.argtypes = [ctypes.c_void_p]
            lib.cl_load_batch.restype = ctypes.c_int
            lib.cl_load_batch.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte),
                ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int),
            ]
            _lib = lib
        except (subprocess.CalledProcessError, OSError) as e:  # pragma: no cover
            print(f"native canvas loader unavailable ({e}); falling back to cv2")
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeCanvasLoader:
    """Persistent decode thread pool; loads a batch of JPEGs into a zeroed
    [n, canvas, canvas, 3] uint8 RGB array with images pasted at the origin."""

    def __init__(self, num_threads: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native canvas loader unavailable")
        self._lib = lib
        self._pool = lib.cl_create(num_threads)

    def load_batch(self, paths, canvas: int):
        n = len(paths)
        out = np.zeros((n, canvas, canvas, 3), dtype=np.uint8)
        heights = np.zeros(n, dtype=np.int32)
        widths = np.zeros(n, dtype=np.int32)
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
        ok = self._lib.cl_load_batch(
            self._pool,
            c_paths,
            n,
            canvas,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            heights.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            widths.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        if ok != n:
            bad = [paths[i] for i in range(n) if heights[i] == 0]
            raise FileNotFoundError(f"failed to decode {n - ok} images, e.g. {bad[:3]}")
        return out, heights, widths

    def __del__(self):
        try:
            if getattr(self, "_pool", None):
                self._lib.cl_destroy(self._pool)
                self._pool = None
        except Exception:
            pass
