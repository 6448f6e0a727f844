"""Host-side audio IO and sample-format utilities.

Replaces the reference's soundfile/librosa/torchaudio host stack
(utils/dataset.py:202-237, demo_convnext.py:52-69) with scipy + numpy:
WAV reading via scipy.io.wavfile, high-quality resampling via polyphase
filtering (scipy.signal.resample_poly, Kaiser window - the same algorithm
class as librosa's kaiser_best), int16<->float32 conversion with the
reference's exact scaling (utilities.py:220-227).
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np


def float32_to_int16(x: np.ndarray) -> np.ndarray:
    """Clip to [-1, 1] and scale by 32767 (utilities.py:220-223).

    Uses the native OpenMP data plane (native/audio_host.cpp) when built.
    """
    from audioset_convnext_inf_tpu.utils import native

    return native.float32_to_int16(np.asarray(x))


def int16_to_float32(x: np.ndarray) -> np.ndarray:
    """x / 32767 (utilities.py:226-227); native-accelerated when available."""
    from audioset_convnext_inf_tpu.utils import native

    return native.int16_to_float32(np.asarray(x))


def pad_or_truncate(x: np.ndarray, audio_length: int) -> np.ndarray:
    """Zero-pad tail or left-crop to exactly ``audio_length`` samples
    (utilities.py:230-235)."""
    if len(x) <= audio_length:
        return np.concatenate((x, np.zeros(audio_length - len(x), dtype=x.dtype)))
    return x[:audio_length]


def pad_audio(x: np.ndarray, audio_length: int) -> np.ndarray:
    """Zero-pad to at least ``audio_length`` without truncating
    (utilities.py:238-243)."""
    if len(x) <= audio_length:
        return np.concatenate((x, np.zeros(audio_length - len(x), dtype=x.dtype)))
    return x


def decimate_resample(waveform: np.ndarray, sample_rate: int) -> np.ndarray:
    """Stride-decimation 32k -> {32k,16k,8k} (data_generator.py:107-123)."""
    if sample_rate == 32000:
        return waveform
    if sample_rate == 16000:
        return waveform[0::2]
    if sample_rate == 8000:
        return waveform[0::4]
    raise ValueError("Incorrect sample rate! (must be 8000/16000/32000)")


def resample_poly(waveform: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling with a Kaiser-windowed lowpass.

    Hot loop runs in the native C++ plane (resample_upfirdn, OpenMP over
    output samples; matches scipy.signal.resample_poly to ~1e-7) with a
    scipy fallback when the library isn't built.
    """
    if orig_sr == target_sr:
        return waveform.astype(np.float32, copy=False)
    g = math.gcd(int(orig_sr), int(target_sr))
    up, down = target_sr // g, orig_sr // g

    from audioset_convnext_inf_tpu.utils import native

    out = native.resample_poly_kaiser(np.asarray(waveform, np.float32), up, down)
    if out is not None:
        return out
    from scipy import signal

    return signal.resample_poly(waveform.astype(np.float64), up, down).astype(np.float32)


def normalize_pcm(data: np.ndarray, mono: bool = True) -> np.ndarray:
    """PCM samples of any WAV dtype -> float32 in [-1, 1], optionally mono."""
    if data.dtype == np.int16:
        x = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        x = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        x = (data.astype(np.float32) - 128.0) / 128.0
    else:
        x = data.astype(np.float32)
    if mono and x.ndim > 1:
        x = x.mean(axis=1)
    return x


def read_wav(path: str, target_sr: int | None = None, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 waveform in [-1, 1], sample_rate).

    Optionally downmixes to mono (channel mean, like soundfile+mean in
    dataset.py:204-207) and resamples to ``target_sr``. Parsing and decode
    run in the native C++ plane (PCM 8/16/24/32 + IEEE float, incl.
    WAVE_FORMAT_EXTENSIBLE) with a scipy fallback.
    """
    from audioset_convnext_inf_tpu.utils import native

    with open(path, "rb") as f:
        raw = f.read()
    decoded = native.decode_wav_bytes(raw, mono=mono)
    if decoded is not None:
        x, sr = decoded
        if target_sr is not None and sr != target_sr:
            x = resample_poly(x, sr, target_sr)
            sr = target_sr
        return x, sr
    import io

    from scipy.io import wavfile

    sr, data = wavfile.read(io.BytesIO(raw))  # reuse the bytes already read
    x = normalize_pcm(data, mono=mono)
    if target_sr is not None and sr != target_sr:
        x = resample_poly(x, sr, target_sr)
        sr = target_sr
    return x, sr


def read_flac(path: str, target_sr: int | None = None, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Read a FLAC file -> (float32 waveform in [-1, 1), sample_rate).

    The reference reads AudioSet clips from .flac via libsndfile
    (utils/dataset.py:202); this image ships neither libsndfile nor ffmpeg,
    so decode runs in the first-party native decoder
    (native/flac_decode.cpp, CRC-verified). Raises on malformed streams -
    there is no softer fallback to fall to.
    """
    from audioset_convnext_inf_tpu.utils import native

    with open(path, "rb") as f:
        raw = f.read()
    decoded = native.decode_flac_bytes(raw, mono=mono)
    if decoded is None:
        raise ValueError(
            f"cannot decode FLAC {path!r}: native decoder unavailable or "
            "stream malformed/unsupported"
        )
    x, sr = decoded
    if target_sr is not None and sr != target_sr:
        x = resample_poly(x, sr, target_sr)
        sr = target_sr
    return x, sr


def read_audio(path: str, target_sr: int | None = None, mono: bool = True) -> Tuple[np.ndarray, int]:
    """Read WAV or FLAC by content magic (extension as tiebreaker).

    The packing flow (data/pack.py, reference dataset.py:202) sees .flac
    AudioSet clips and .wav everywhere else; this is the single entry point.
    """
    with open(path, "rb") as f:
        magic = f.read(4)
    if magic == b"fLaC":
        return read_flac(path, target_sr=target_sr, mono=mono)
    return read_wav(path, target_sr=target_sr, mono=mono)
