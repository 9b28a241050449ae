"""ctypes bindings for the native tile-IO runtime (native/tileio.cpp).

Compiles the shared library on first use (g++, cached next to the source);
every entry point has a numpy fallback so the framework works without a
toolchain. ctypes releases the GIL around calls, so the multi-threaded
gather overlaps with the JAX dispatch thread even on a 1-core host.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_SRC = _NATIVE_DIR / "tileio.cpp"
_LIB = _NATIVE_DIR / "libtileio.so"

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", str(_LIB), str(_SRC), "-lpthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if not _LIB.exists() and _SRC.exists():
        _build()
    if _LIB.exists():
        try:
            lib = ctypes.CDLL(str(_LIB))
            lib.gather_tiles.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
            lib.gather_tiles_f16_to_f32.argtypes = [
                ctypes.POINTER(ctypes.c_void_p),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
            lib.tileio_version.restype = ctypes.c_int
            if lib.tileio_version() == 1:
                _lib = lib
        except OSError:
            _lib = None
    return _lib


def native_available() -> bool:
    return get_lib() is not None


def gather_batch(tiles: List[np.ndarray], out: Optional[np.ndarray] = None,
                 n_threads: int = 4) -> np.ndarray:
    """Gather tiles (each [H, W, C] or [H, W], all same shape, float32 or
    float16 sources) into one contiguous float32 batch [N, ...]."""
    n = len(tiles)
    first = tiles[0]
    shape = (n,) + first.shape
    if out is None:
        out = np.empty(shape, dtype=np.float32)
    assert out.shape == shape and out.dtype == np.float32

    lib = get_lib()
    contiguous = all(t.flags["C_CONTIGUOUS"] for t in tiles)
    same_dtype = all(t.dtype == first.dtype for t in tiles)
    if lib is None or not contiguous or not same_dtype or \
            first.dtype not in (np.float32, np.float16):
        for i, t in enumerate(tiles):
            out[i] = t
        return out

    srcs = (ctypes.c_void_p * n)(
        *[t.ctypes.data_as(ctypes.c_void_p).value for t in tiles])
    if first.dtype == np.float32:
        lib.gather_tiles(srcs, out.ctypes.data_as(ctypes.c_void_p),
                         ctypes.c_int64(first.nbytes), ctypes.c_int64(n),
                         ctypes.c_int(n_threads))
    else:  # float16 -> float32 widening gather
        lib.gather_tiles_f16_to_f32(
            srcs, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_int64(first.size), ctypes.c_int64(n),
            ctypes.c_int(n_threads))
    return out
