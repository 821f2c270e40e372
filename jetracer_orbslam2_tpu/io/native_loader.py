"""ctypes bindings for the native C++ decode/prefetch runtime.

Wraps native/libjetracer_native.so (PNG decoder + threaded frame loader
with a preallocated slot ring — see native/frame_loader.cpp).  Falls back
gracefully: `available()` is False when the library isn't built, and
io/datasets.py then uses PIL.  ctypes releases the GIL during native
calls, so decode threads genuinely overlap Python-side work.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional

import numpy as np

_LIB_NAME = "libjetracer_native.so"
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    path = os.path.join(_native_dir(), _LIB_NAME)
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.png_probe.restype = ctypes.c_int
    lib.png_probe.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.png_decode.restype = ctypes.c_int
    lib.png_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
    lib.loader_open.restype = ctypes.c_void_p
    lib.loader_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
    lib.loader_count.restype = ctypes.c_int
    lib.loader_count.argtypes = [ctypes.c_void_p]
    lib.loader_next_info.restype = ctypes.c_int
    lib.loader_next_info.argtypes = [
        ctypes.c_void_p] + [ctypes.POINTER(ctypes.c_int)] * 5
    lib.loader_take.restype = ctypes.c_int
    lib.loader_take.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t]
    lib.loader_skip.restype = ctypes.c_int
    lib.loader_skip.argtypes = [ctypes.c_void_p]
    lib.loader_close.restype = None
    lib.loader_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def build(quiet: bool = True) -> bool:
    """Build the native library in place (requires g++, zlib)."""
    try:
        subprocess.run(
            ["make", "-C", _native_dir()],
            check=True, capture_output=quiet)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    global _lib_tried
    _lib_tried = False
    return _load() is not None


def available() -> bool:
    """True when the native library is loadable AND not explicitly
    disabled (JETRACER_DISABLE_NATIVE=1 forces the PIL path — used by
    tests to prove both decoders agree, and as an escape hatch)."""
    if os.environ.get("JETRACER_DISABLE_NATIVE"):
        return False
    return _load() is not None


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string -> (H, W) or (H, W, C) uint8/uint16 array."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (run make -C native)")
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    bd = ctypes.c_int()
    rc = lib.png_probe(data, len(data), ctypes.byref(w), ctypes.byref(h),
                       ctypes.byref(ch), ctypes.byref(bd))
    if rc != 0:
        raise ValueError(f"png_probe failed: {rc}")
    dtype = np.uint16 if bd.value == 16 else np.uint8
    shape = ((h.value, w.value) if ch.value == 1
             else (h.value, w.value, ch.value))
    out = np.empty(shape, dtype)
    rc = lib.png_decode(
        data, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.nbytes)
    if rc != 0:
        raise ValueError(f"png_decode failed: {rc}")
    return out


def decode_png_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return decode_png(f.read())


class NativeFrameLoader:
    """In-order prefetching iterator over a list of PNG paths.

    Yields (index, array) with decode running ahead on C++ threads.
    Errored frames are skipped with a warning.
    """

    def __init__(self, paths: list[str], threads: int = 4,
                 capacity: int = 8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built")
        self._lib = lib
        joined = "\n".join(paths).encode()
        self._h = lib.loader_open(joined, threads, capacity)
        if not self._h:
            raise RuntimeError("loader_open failed")
        self.num_errors = 0

    def __iter__(self) -> Iterator[tuple[int, np.ndarray]]:
        lib = self._lib
        idx = ctypes.c_int()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ch = ctypes.c_int()
        bd = ctypes.c_int()
        while True:
            rc = lib.loader_next_info(
                self._h, ctypes.byref(idx), ctypes.byref(w),
                ctypes.byref(h), ctypes.byref(ch), ctypes.byref(bd))
            if rc == 1 or rc == 2:
                return
            if rc < 0:
                self.num_errors += 1
                lib.loader_skip(self._h)
                continue
            dtype = np.uint16 if bd.value == 16 else np.uint8
            shape = ((h.value, w.value) if ch.value == 1
                     else (h.value, w.value, ch.value))
            out = np.empty(shape, dtype)
            rc = lib.loader_take(
                self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.nbytes)
            if rc != 0:
                raise RuntimeError(f"loader_take failed: {rc}")
            yield int(idx.value), out

    def close(self):
        if self._h:
            self._lib.loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
