"""ctypes bindings for the native (C++) runtime components.

The compute path is JAX/Pallas; host-side IO is native C++ where the
reference's was (VideoLoader wraps cv::VideoCapture with a decode thread,
native/video_loader.cpp). Builds on demand with `make -C native`; falls back
gracefully (available() -> False) when the toolchain or OpenCV is missing,
in which case utils/video.py uses the Python decoder.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "librslam_native.so"
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=300,
            )
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None
    lib.vl_open.restype = ctypes.c_void_p
    lib.vl_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.vl_props.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.vl_next.restype = ctypes.c_int
    lib.vl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
    lib.vl_close.argtypes = [ctypes.c_void_p]
    lib.vl_load_mask.restype = ctypes.c_int
    lib.vl_load_mask.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


class NativeVideoLoader:
    """Threaded native decoder: frames come out as uint8 [H, W] grayscale."""

    def __init__(self, path: str, queue_size: int = 4):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.vl_open(path.encode(), queue_size)
        if not self._h:
            raise FileNotFoundError(f"cannot open video: {path}")
        w = ctypes.c_int()
        h = ctypes.c_int()
        fps = ctypes.c_double()
        lib.vl_props(self._h, ctypes.byref(w), ctypes.byref(h), ctypes.byref(fps))
        self.width = w.value
        self.height = h.value
        self.fps = fps.value

    def get_next_frame(self) -> np.ndarray | None:
        buf = np.empty((self.height, self.width), np.uint8)
        ok = self._lib.vl_next(
            self._h, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        return buf if ok else None

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        f = self.get_next_frame()
        if f is None:
            raise StopIteration
        return f

    def close(self):
        if self._h:
            self._lib.vl_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_mask_native(path: str, max_side: int = 8192) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = np.empty(max_side * max_side, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.vl_load_mask(
        path.encode(),
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(w),
        ctypes.byref(h),
        max_side * max_side,
    )
    if rc != 1:
        raise FileNotFoundError(f"cannot open mask: {path}")
    return (buf[: w.value * h.value].reshape(h.value, w.value) > 0).astype(
        np.float32
    )
