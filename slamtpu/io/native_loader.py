"""ctypes bindings for the native C++ frame loader (native/frame_loader.cpp).

The native library decodes PGM/PNG frames with a pthread worker pool,
prefetching ahead of the consumer — the runtime role OpenCV's C++ videoio
plays for the reference. Built on demand with g++ (no pip/pybind11
dependency); falls back gracefully if a compiler is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

__all__ = ["NativeFrameLoader", "native_available", "load_frames_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libframe_loader.so"))
_lib = None


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "frame_loader.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-fPIC", "-std=c++17", "-shared", "-o", _LIB_PATH, src,
             "-lz", "-lpthread"],
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.loader_open.restype = ctypes.c_void_p
    lib.loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.loader_frame_size.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
                                      ctypes.POINTER(ctypes.c_int)]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeFrameLoader:
    """Streaming chunk reader over a list of image paths.

    with NativeFrameLoader(paths, threads=4, prefetch=32) as loader:
        for chunk in loader.chunks(32):  # [<=32, H, W] uint8
            ...
    """

    def __init__(
        self,
        paths: List[str],
        out_size: Optional[tuple] = None,
        threads: int = 4,
        prefetch: int = 32,
    ):
        lib = _load()
        if lib is None:
            raise RuntimeError("native frame loader unavailable (g++/zlib missing?)")
        self._lib = lib
        self._n = len(paths)
        arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
        oh, ow = out_size or (0, 0)
        self._handle = lib.loader_open(arr, len(paths), oh, ow, threads, prefetch)
        h = ctypes.c_int()
        w = ctypes.c_int()
        lib.loader_frame_size(self._handle, ctypes.byref(h), ctypes.byref(w))
        self.height, self.width = h.value, w.value
        if self.height == 0:
            raise ValueError("could not decode the first frame")

    def read(self, max_frames: int) -> np.ndarray:
        out = np.empty((max_frames, self.height, self.width), np.uint8)
        got = self._lib.loader_next(
            self._handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_frames
        )
        return out[:got]

    def chunks(self, chunk_size: int):
        while True:
            block = self.read(chunk_size)
            if block.shape[0] == 0:
                return
            yield block

    def close(self):
        if self._handle:
            self._lib.loader_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


def load_frames_native(directory: str, max_frames: Optional[int] = None,
                       threads: int = 4) -> np.ndarray:
    """Load a whole image directory (sorted) through the native loader."""
    names = sorted(
        f for f in os.listdir(directory) if f.lower().endswith((".png", ".pgm"))
    )
    if max_frames:
        names = names[:max_frames]
    paths = [os.path.join(directory, n) for n in names]
    with NativeFrameLoader(paths, threads=threads) as loader:
        out = loader.read(len(paths))
    return out
