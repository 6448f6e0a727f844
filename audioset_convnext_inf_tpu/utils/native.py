"""ctypes bindings for the native host audio data plane (native/audio_host.cpp).

Loads ``libaudiohost.so`` (building it with make on first use if a compiler
is available); every entry point has a numpy fallback so the package works
without the native library. Exposes the same semantics as the reference's
numpy helpers (utilities.py:220-235, data_generator.py:107-123) but fused
and multi-threaded.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False
_LOAD_LOCK = threading.Lock()

# int16 -> float32 scale, rounded to float32 EXACTLY like the native kernel's
# `1.0f / 32767.0f` (audio_host.cpp:22). The numpy fallbacks multiply by this
# f32 constant rather than dividing in f64 so fallback and native results are
# BIT-IDENTICAL - a loader thread that races the first `_load()` must not
# produce different sample values than its siblings (that skew was observed
# as a ~1-ulp batch divergence breaking train-run determinism). The shared
# f64 value lives in config.INT16_SCALE; the device decodes use it too.
from audioset_convnext_inf_tpu.config import INT16_SCALE

_INT16_SCALE = np.float32(INT16_SCALE)


def _native_dir() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    )


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOAD_LOCK:
        return _load_locked()


def _load_locked() -> Optional[ctypes.CDLL]:
    """Build/dlopen under _LOAD_LOCK. _TRIED flips only AFTER the attempt
    finishes: the old check-then-act (set _TRIED, then spend seconds in make/
    dlopen) sent every concurrent first-use caller down the numpy fallback,
    which made first-epoch loader batches nondeterministic."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:  # lost the race to another loader thread
        return _LIB
    try:
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
    finally:
        _TRIED = True


def available() -> bool:
    return _load() is not None


def int16_to_float32(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    if lib is None:
        return x.astype(np.float32) * _INT16_SCALE
    out = np.empty(x.shape, np.float32)
    lib.int16_to_float32(x.reshape(-1), out.reshape(-1), x.size)
    return out


def float32_to_int16(x: np.ndarray) -> np.ndarray:
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    if lib is None:
        # f32 multiply + C-truncation, matching the native kernel bitwise
        return (np.clip(x, -1, 1) * np.float32(32767.0)).astype(np.int16)
    out = np.empty(x.shape, np.int16)
    lib.float32_to_int16(x.reshape(-1), out.reshape(-1), x.size)
    return out


def decode_batch_int16(x: np.ndarray, out_len: int) -> np.ndarray:
    """(N, L) int16 -> (N, out_len) float32, decode + pad/truncate fused."""
    lib = _load()
    x = np.ascontiguousarray(x, np.int16)
    n, src_len = x.shape
    if lib is None:
        dec = x.astype(np.float32) * _INT16_SCALE
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
        return x[::stride].astype(np.float32) * _INT16_SCALE
    out_n = (len(x) + stride - 1) // stride
    out = np.empty(out_n, np.float32)
    lib.decimate_int16_to_float32(x, len(x), stride, out)
    return out


# ---------------------------------------------------------------------------
# WAV decode + polyphase resampling (native/audio_host.cpp round-2 additions)
# ---------------------------------------------------------------------------


class _WavInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int32),
        ("channels", ctypes.c_int32),
        ("bits_per_sample", ctypes.c_int32),
        ("format", ctypes.c_int32),
        ("frames", ctypes.c_int64),
        ("data_offset", ctypes.c_int64),
        ("data_bytes", ctypes.c_int64),
    ]


def _load_wav_api(lib: ctypes.CDLL) -> bool:
    if getattr(lib, "_wav_api_ready", False):
        return True
    try:
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.wav_info.argtypes = [u8p, i64, ctypes.POINTER(_WavInfo)]
        lib.wav_info.restype = ctypes.c_int
        lib.wav_decode.argtypes = [u8p, i64, ctypes.POINTER(_WavInfo), f32p,
                                   ctypes.c_int]
        lib.wav_decode.restype = ctypes.c_int
        lib.resample_upfirdn.argtypes = [f32p, i64, f64p, i64, i64, i64, f32p, i64]
        lib._wav_api_ready = True
        return True
    except AttributeError:
        return False


def decode_wav_bytes(buf: bytes, mono: bool = True):
    """RIFF/WAVE bytes -> (float32 waveform in [-1, 1], sample_rate).

    Native parser handles PCM 8/16/24/32 and IEEE float32/64 (incl.
    WAVE_FORMAT_EXTENSIBLE). Returns None when the native library is absent
    or the format is unsupported (caller falls back to scipy).
    """
    lib = _load()
    if lib is None or not _load_wav_api(lib):
        return None
    arr = np.frombuffer(buf, np.uint8)
    info = _WavInfo()
    if lib.wav_info(arr, arr.size, ctypes.byref(info)) != 0:
        return None
    if mono:
        out = np.empty(info.frames, np.float32)
    else:
        out = np.empty((info.frames, info.channels), np.float32)
    if lib.wav_decode(arr, arr.size, ctypes.byref(info), out.reshape(-1),
                      1 if mono else 0) != 0:
        return None
    return out, int(info.sample_rate)


def _kaiser_firwin(numtaps: int, cutoff: float, beta: float) -> np.ndarray:
    """scipy.signal.firwin(numtaps, cutoff, window=("kaiser", beta)) in pure
    numpy: windowed sinc, DC-gain normalized."""
    n = np.arange(numtaps, dtype=np.float64)
    m = n - (numtaps - 1) / 2.0
    h = cutoff * np.sinc(cutoff * m)
    h *= np.kaiser(numtaps, beta)
    return h / h.sum()


@functools.lru_cache(maxsize=16)
def _resample_filter(up: int, down: int) -> np.ndarray:
    max_rate = max(up, down)
    return _kaiser_firwin(2 * 10 * max_rate + 1, 1.0 / max_rate, 5.0) * up


def resample_poly_kaiser(x: np.ndarray, up: int, down: int) -> Optional[np.ndarray]:
    """scipy.signal.resample_poly(x, up, down) semantics (default Kaiser 5.0
    window, 10*max(up,down) half-length) with the upfirdn hot loop in C++.

    Returns None when the native library is unavailable.
    """
    lib = _load()
    if lib is None or not _load_wav_api(lib):
        return None
    x = np.asarray(x)
    if x.ndim != 1:
        return None  # the C core is 1-D; callers fall back to scipy (axis=0)
    x = np.ascontiguousarray(x, np.float32)
    h = _resample_filter(int(up), int(down))
    ny = -(-x.shape[-1] * up // down)
    out = np.empty(ny, np.float32)
    lib.resample_upfirdn(x, x.shape[-1], h, h.size, up, down, out, ny)
    return out


# ---------------------------------------------------------------------------
# FLAC decode (native/flac_decode.cpp, round-3 addition)
# ---------------------------------------------------------------------------


class _FlacInfo(ctypes.Structure):
    _fields_ = [
        ("sample_rate", ctypes.c_int64),
        ("channels", ctypes.c_int64),
        ("bits", ctypes.c_int64),
        ("frames", ctypes.c_int64),
    ]


def _load_flac_api(lib: ctypes.CDLL) -> bool:
    if getattr(lib, "_flac_api_ready", False):
        return True
    try:
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64
        lib.flac_info.argtypes = [u8p, i64, ctypes.POINTER(_FlacInfo)]
        lib.flac_info.restype = ctypes.c_int
        lib.flac_decode.argtypes = [u8p, i64, f32p, i64, ctypes.c_int,
                                    ctypes.POINTER(i64)]
        lib.flac_decode.restype = ctypes.c_int
        lib._flac_api_ready = True
        return True
    except AttributeError:
        return False


def decode_flac_bytes(buf: bytes, mono: bool = True):
    """FLAC bytes -> (float32 waveform in [-1, 1), sample_rate) or None.

    First-party decoder (native/flac_decode.cpp): CONSTANT/VERBATIM/FIXED/
    LPC subframes, Rice methods 0/1 incl. escapes, wasted bits, L-S/R-S/M-S
    stereo decorrelation, CRC-8/16 verified. Returns None when the native
    library is absent or the stream is malformed/unsupported (e.g. unknown
    total-sample count), so callers can fall back or raise.
    """
    lib = _load()
    if lib is None or not _load_flac_api(lib):
        return None
    arr = np.frombuffer(buf, np.uint8)
    info = _FlacInfo()
    if lib.flac_info(arr, arr.size, ctypes.byref(info)) != 0:
        return None
    if info.frames <= 0:  # STREAMINFO total unknown: refuse rather than guess
        return None
    # Bound the output allocation by what the stream could possibly encode:
    # STREAMINFO's total-sample field is 36 bits and attacker-controlled.
    # The densest legal coding is a CONSTANT subframe per channel: >= ~10
    # bytes of frame header/CRCs plus >= ~2 bytes per channel, per
    # <= 65536-sample frame. The floor cost is per FRAME, not per sample
    # value, so the limit must not shrink with channel count (stereo
    # silence at blocksize 65535 legitimately packs >8192 sample-values
    # per byte). Bound samples-PER-CHANNEL by the per-frame cost; refuse
    # unsatisfiable headers before np.empty reserves hundreds of GB of
    # address space for a garbage stream.
    min_frame_bytes = 10 + 2 * max(int(info.channels), 1)
    if info.frames > (arr.size // min_frame_bytes + 1) * 65536:
        return None
    if mono:
        out = np.empty(info.frames, np.float32)
    else:
        out = np.empty((info.frames, info.channels), np.float32)
    got = ctypes.c_int64(0)
    rc = lib.flac_decode(arr, arr.size, out.reshape(-1), info.frames,
                         1 if mono else 0, ctypes.byref(got))
    if rc != 0:
        return None
    n = int(got.value)
    return out[:n], int(info.sample_rate)
