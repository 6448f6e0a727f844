"""Kaldi-compatible log mel-filterbank features (host-side numpy).

The reference's optional ``use_torchaudio`` mode computes
``torchaudio.compliance.kaldi.fbank(htk_compat=True, sample_frequency=32000,
use_energy=False, window_type='hanning', num_mel_bins=224, dither=0.0,
frame_length=64.0, frame_shift=10.0)`` inside the dataset worker
(data_generator.py:75-97) and feeds the model spectrogram images directly
(convnext.py:176-177,297-299). This module reimplements that fbank variant
from the Kaldi specification:

 - snip_edges framing (no centering): T = 1 + (N - frame_len) // shift
   -> 994 frames for a 10 s / 32 kHz clip (the reference's printed shape)
 - per-frame DC offset removal, preemphasis 0.97 (Kaldi edge convention)
 - 'hanning' window (symmetric), power spectrum on a pow2-padded FFT
 - HTK-scale mel bank, low_freq=20 to Nyquist, no normalization
 - natural-log output clamped at eps

Host-side by design (like the reference's worker-side computation); the
arrays are plain numpy so DataLoader threads can run it GIL-free via the
underlying BLAS/FFT.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

_EPS = 1.1920928955078125e-07  # torch float32 eps, kaldi's clamp


def _hz_to_htk_mel(f):
    return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)


@lru_cache(maxsize=8)
def _kaldi_mel_banks(num_bins: int, padded_window: int, sample_rate: int,
                     low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi MelBanks: triangular filters in HTK mel space, shape
    (num_bins, padded_window//2 + 1); the Nyquist bin is excluded by Kaldi
    (it computes num_fft_bins = padded_window/2 columns) - we keep a zero
    column there for a clean matmul."""
    if high_freq <= 0.0:
        high_freq = sample_rate / 2.0 + high_freq
    num_fft_bins = padded_window // 2
    fft_bin_width = sample_rate / padded_window
    mel_low = _hz_to_htk_mel(low_freq)
    mel_high = _hz_to_htk_mel(high_freq)
    mel_delta = (mel_high - mel_low) / (num_bins + 1)

    bins = np.zeros((num_bins, num_fft_bins + 1), np.float64)
    fft_freqs = fft_bin_width * np.arange(num_fft_bins)
    mel = _hz_to_htk_mel(fft_freqs)
    for j in range(num_bins):
        left = mel_low + j * mel_delta
        center = mel_low + (j + 1) * mel_delta
        right = mel_low + (j + 2) * mel_delta
        up = (mel - left) / (center - left)
        down = (right - mel) / (right - center)
        bins[j, :num_fft_bins] = np.clip(np.minimum(up, down), 0.0, None)
    return bins.astype(np.float32)


def kaldi_fbank(
    waveform: np.ndarray,
    sample_rate: int = 32000,
    num_mel_bins: int = 224,
    frame_length_ms: float = 64.0,
    frame_shift_ms: float = 10.0,
    preemphasis: float = 0.97,
    remove_dc_offset: bool = True,
    window_type: str = "hanning",
    low_freq: float = 20.0,
    high_freq: float = 0.0,
) -> np.ndarray:
    """(N,) or (B, N) float waveform -> (T, num_mel_bins) / (B, T, bins)."""
    squeeze = waveform.ndim == 1
    x = np.atleast_2d(np.asarray(waveform, np.float32))
    frame_len = int(sample_rate * frame_length_ms / 1000.0)
    shift = int(sample_rate * frame_shift_ms / 1000.0)
    padded = 1 << (frame_len - 1).bit_length()  # round up to pow2

    n = x.shape[-1]
    num_frames = max(0, 1 + (n - frame_len) // shift)
    idx = np.arange(num_frames)[:, None] * shift + np.arange(frame_len)[None, :]
    frames = x[:, idx]  # (B, T, frame_len)

    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemphasis:
        prev = np.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev

    if window_type == "hanning":
        win = np.hanning(frame_len).astype(np.float32)
    elif window_type == "hamming":
        win = np.hamming(frame_len).astype(np.float32)
    elif window_type == "povey":
        win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(frame_len) / (frame_len - 1))) ** 0.85
        win = win.astype(np.float32)
    else:
        raise ValueError(f"unsupported window_type {window_type!r}")
    frames = frames * win

    if padded > frame_len:
        frames = np.pad(frames, ((0, 0), (0, 0), (0, padded - frame_len)))
    spec = np.fft.rfft(frames, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)

    banks = _kaldi_mel_banks(num_mel_bins, padded, sample_rate, low_freq, high_freq)
    mel = power @ banks.T
    out = np.log(np.maximum(mel, _EPS))
    return out[0] if squeeze else out
