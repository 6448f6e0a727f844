"""ctypes bindings for the native host audio data plane (native/audio_host.cpp).

Loads ``libaudiohost.so`` (building it with make on first use if a compiler
is available); every entry point has a numpy fallback so the package works
without the native library. Exposes the same semantics as the reference's
numpy helpers (utilities.py:220-235, data_generator.py:107-123) but fused
and multi-threaded.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(_native_dir(), "libaudiohost.so")
    if not os.path.exists(so_path):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None

    i16p = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.int16_to_float32.argtypes = [i16p, f32p, i64]
    lib.float32_to_int16.argtypes = [f32p, i16p, i64]
    lib.decode_batch_int16.argtypes = [i16p, i64, i64, f32p, i64]
    lib.decimate_int16_to_float32.argtypes = [i16p, i64, i64, f32p]
    lib.omp_thread_count.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def int16_to_float32(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    if lib is None:
        return (x / 32767.0).astype(np.float32)
    out = np.empty(x.shape, np.float32)
    lib.int16_to_float32(x.reshape(-1), out.reshape(-1), x.size)
    return out


def float32_to_int16(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        return (np.clip(x, -1, 1) * 32767.0).astype(np.int16)
    out = np.empty(x.shape, np.int16)
    lib.float32_to_int16(x.reshape(-1), out.reshape(-1), x.size)
    return out


def decode_batch_int16(x: np.ndarray, out_len: int) -> np.ndarray:
    """(N, L) int16 -> (N, out_len) float32, decode + pad/truncate fused."""
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    n, src_len = x.shape
    if lib is None:
        dec = (x / 32767.0).astype(np.float32)
        if src_len >= out_len:
            return np.ascontiguousarray(dec[:, :out_len])
        return np.pad(dec, ((0, 0), (0, out_len - src_len)))
    out = np.empty((n, out_len), np.float32)
    lib.decode_batch_int16(x, n, src_len, out, out_len)
    return out


def decimate_int16_to_float32(x: np.ndarray, stride: int) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    if lib is None:
        return (x[::stride] / 32767.0).astype(np.float32)
    out_n = (len(x) + stride - 1) // stride
    out = np.empty(out_n, np.float32)
    lib.decimate_int16_to_float32(x, len(x), stride, out)
    return out
