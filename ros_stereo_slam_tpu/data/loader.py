"""Prefetching frame loader over the native C++ library.

The compute path is JAX; the IO runtime around it is native C++
(``native/dataloader.cc``): a libpng decoder + worker-thread pool with a
bounded look-ahead window, so the SLAM loop never stalls on disk (the
reference blocks its frame loop on ``cv::imread`` every frame,
``/root/reference/src/rosFuncs.cpp:48-71``).

The shared library is built on demand (``make -C native``); a pure-Python
PIL fallback keeps everything functional without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from dataclasses import dataclass

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libslamloader.so")
_lib = None


def _ensure_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True,
                capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_get.restype = ctypes.c_int
    lib.loader_get.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _ensure_lib() is not None


@dataclass
class PrefetchLoader:
    """Ordered prefetching reader for a list of PNG paths."""

    paths: list
    width: int
    height: int
    n_threads: int = 4
    lookahead: int = 8

    def __post_init__(self):
        self._lib = _ensure_lib()
        self._handle = None
        if self._lib is not None:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._handle = self._lib.loader_create(
                arr, len(self.paths), self.n_threads, self.lookahead
            )
        self._buf = np.empty((self.height, self.width), dtype=np.float32)

    def __len__(self) -> int:
        return len(self.paths)

    def get(self, idx: int) -> np.ndarray:
        if self._handle is not None:
            w = ctypes.c_int()
            h = ctypes.c_int()
            rc = self._lib.loader_get(
                self._handle, idx,
                self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                ctypes.byref(w), ctypes.byref(h),
            )
            if rc == 0:
                if (h.value, w.value) != self._buf.shape:
                    raise ValueError(
                        f"frame {idx} is {h.value}x{w.value}, "
                        f"expected {self.height}x{self.width}"
                    )
                return self._buf.copy()
            raise IOError(f"native decode failed for {self.paths[idx]} (rc={rc})")
        # PIL fallback.
        from ros_stereo_slam_tpu.data.kitti import _decode_png_gray

        return _decode_png_gray(self.paths[idx])

    def close(self):
        if self._handle is not None and self._lib is not None:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
