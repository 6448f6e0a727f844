"""TPU-native log-mel frontend.

Replaces the reference's torchlibrosa ``Spectrogram`` + ``LogmelFilterBank``
(pytorch/convnext.py:176-200) with a GEMM-formulated pipeline that XLA maps
straight onto the MXU:

    waveform -(reflect pad + strided reshape framing)-> frames (B, T, 1024)
            -(Hann . frames) @ [DFT_cos | DFT_sin]     -> re/im   (B, T, 513)
            -(re^2 + im^2)                             -> power   (B, T, 513)
            -(power @ mel^T)                           -> mel     (B, T, 224)
            -(10*log10(clip(., amin)) - 10*log10(max(amin, ref)))

Design notes (TPU-first):
 - No FFT: a 1024-point DFT as two (1024, 513) GEMMs is a few us/clip on the
   MXU and fuses with the mel matmul; XLA's FFT lowering is far slower.
 - Framing is pure reshape+slice (hop 320 divides the frame into 3x320+64
   chunks), so no gather with a (T*1024) index tensor is ever materialized.
 - All constants (window-scaled DFT bases, mel matrix) are precomputed in
   float64 numpy then cast, matching torchlibrosa/librosa numerics.

A fused Pallas kernel with identical semantics lives in
``ops.pallas_frontend``; this module is the reference implementation and the
fallback on CPU.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.config import FrontendConfig

# ---------------------------------------------------------------------------
# Host-side constant builders (float64 numpy for bit-parity with librosa)
# ---------------------------------------------------------------------------


def hann_window_periodic(win_length: int, dtype=np.float64) -> np.ndarray:
    """Periodic ("fftbins=True") Hann window, as used by torchlibrosa via
    ``librosa.filters.get_window('hann', win_length, fftbins=True)``."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return w.astype(dtype)


def _hz_to_mel_slaney(frequencies: np.ndarray) -> np.ndarray:
    """Slaney (Auditory Toolbox) Hz->mel: linear below 1 kHz, log above.

    Same formula librosa.hz_to_mel(htk=False) uses, which LogmelFilterBank
    relies on through librosa.filters.mel.
    """
    frequencies = np.asanyarray(frequencies, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (frequencies - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = frequencies >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(frequencies, 1e-10) / min_log_hz) / logstep,
        mels,
    )
    return mels


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asanyarray(mels, dtype=np.float64)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = mels >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    dtype=np.float32,
) -> np.ndarray:
    """Slaney-scale, Slaney-normalized triangular mel filterbank.

    Returns weights of shape (n_mels, n_fft//2 + 1); identical math to
    ``librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax, htk=False,
    norm='slaney')``, which torchlibrosa transposes into its mel matmul.
    """
    n_freqs = n_fft // 2 + 1
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, n_freqs, dtype=np.float64)

    mel_min = _hz_to_mel_slaney(np.array(fmin))
    mel_max = _hz_to_mel_slaney(np.array(fmax))
    mel_pts = np.linspace(mel_min, mel_max, n_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)  # (n_mels + 2,)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]  # (n_mels + 2, n_freqs)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalization: scale each filter by 2 / bandwidth.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(dtype)


@lru_cache(maxsize=8)
def _dft_bases(n_fft: int, win_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Window-scaled real-DFT bases: (n_fft, n_fft//2+1) cos and -sin matrices.

    frames @ cos_b gives Re(STFT), frames @ sin_b gives Im(STFT) for the
    convention X[k] = sum_n x[n] w[n] exp(-2i pi k n / N).
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freqs, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    window = hann_window_periodic(win_length)
    if win_length < n_fft:  # center-pad window to n_fft (librosa pad_center)
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))
    cos_b = np.cos(ang) * window[:, None]
    sin_b = -np.sin(ang) * window[:, None]
    return cos_b.astype(np.float32), sin_b.astype(np.float32)


# ---------------------------------------------------------------------------
# Device-side pipeline
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, num_frames: int) -> jnp.ndarray:
    """Overlapping frames via strided reshape (no gather).

    x: (B, L) already padded for centering. Returns (B, num_frames, n_fft).

    Uses the decomposition n_fft = q*hop + r: frame i is the concatenation of
    hop-sized blocks i..i+q-1 plus the first r samples of block i+q, so the
    whole operation is one reshape plus q+1 static slices - XLA fuses this
    into the downstream DFT GEMM without materializing index tensors.
    """
    b, length = x.shape
    q, r = divmod(n_fft, hop)
    blocks_needed = num_frames + q  # block index up to num_frames-1+q (exclusive r-part)
    padded_len = blocks_needed * hop + (hop if r else 0)
    if padded_len > length:
        x = jnp.pad(x, ((0, 0), (0, padded_len - length)))
    blocks = x[:, : (blocks_needed + (1 if r else 0)) * hop].reshape(b, -1, hop)
    pieces = [
        jax.lax.slice_in_dim(blocks, j, j + num_frames, axis=1) for j in range(q)
    ]
    if r:
        tail = jax.lax.slice_in_dim(blocks, q, q + num_frames, axis=1)[:, :, :r]
        pieces.append(tail)
    return jnp.concatenate(pieces, axis=2)


def power_spectrogram(
    waveform: jnp.ndarray, cfg: FrontendConfig, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """(B, num_samples) float waveform -> (B, T, n_fft//2+1) power spectrum.

    Matches torchlibrosa.stft.Spectrogram(power=2.0) with center=True,
    reflect padding (reference convnext.py:179-187).
    """
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    b, n = waveform.shape
    num_frames = cfg.num_frames(n)
    pad = cfg.n_fft // 2
    if cfg.center:
        waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, num_frames)
    cos_b, sin_b = _dft_bases(cfg.n_fft, cfg.win_length)
    # The DFT is numerically delicate: near-silent bins are tiny differences
    # of large windowed sums, and JAX's default (single-pass bf16) matmul
    # precision turns into multi-dB log-domain error. HIGHEST restores true
    # f32 GEMM accuracy (~1e-4 dB vs f64); HIGH (bf16x3) is a faster middle
    # ground whose residual error sits below bf16-trunk rounding.
    prec = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[cfg.precision]
    frames = frames.astype(jnp.float32)
    re = jnp.einsum(
        "btn,nk->btk", frames, jnp.asarray(cos_b),
        precision=prec, preferred_element_type=jnp.float32,
    )
    im = jnp.einsum(
        "btn,nk->btk", frames, jnp.asarray(sin_b),
        precision=prec, preferred_element_type=jnp.float32,
    )
    return re * re + im * im


def power_to_db(
    mel_power: jnp.ndarray, amin: float, ref: float, top_db: Optional[float]
) -> jnp.ndarray:
    """torchlibrosa LogmelFilterBank.power_to_db semantics."""
    log_spec = 10.0 * jnp.log10(jnp.clip(mel_power, amin))
    log_spec = log_spec - 10.0 * np.log10(max(amin, ref))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, jnp.max(log_spec) - top_db)
    return log_spec


def log_mel_spectrogram(
    waveform: jnp.ndarray,
    cfg: FrontendConfig,
    mel_weights: Optional[jnp.ndarray] = None,
    compute_dtype=jnp.float32,
    affine: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """(B, num_samples) -> (B, 1, T, n_mels) log-mel, reference layout.

    Equivalent to spectrogram_extractor + logmel_extractor at reference
    convnext.py:298-299 (returns the same NCHW-with-C=1 layout the trunk
    transposes for bn0). ``affine=(a, b)`` applies a per-mel-bin ``a*x + b``
    fused into the log's elementwise chain - the eval-mode bn0 fold
    (reference convnext.py:304-306 with running statistics).
    """
    if mel_weights is None:
        mel_weights = jnp.asarray(
            mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
        )
    power = power_spectrogram(waveform, cfg, compute_dtype=compute_dtype)
    mel_prec = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}[cfg.precision]
    mel_power = jnp.einsum(
        "btk,mk->btm",
        power,
        mel_weights.astype(jnp.float32),
        precision=mel_prec,
        preferred_element_type=jnp.float32,
    )
    logmel = power_to_db(mel_power, cfg.amin, cfg.ref, cfg.top_db)
    if affine is not None:
        a, b = affine
        logmel = logmel * a.astype(jnp.float32) + b.astype(jnp.float32)
    return logmel[:, None, :, :]


class LogMelFrontend:
    """Stateless callable bundling config + precomputed mel weights.

    Usage: ``frontend = LogMelFrontend(cfg); logmel = frontend(waveform)``.
    jit-safe: the instance's arrays are closed over as constants.
    """

    def __init__(self, cfg: FrontendConfig = FrontendConfig(), compute_dtype=jnp.float32):
        self.cfg = cfg
        self.compute_dtype = compute_dtype
        self.mel_weights = jnp.asarray(
            mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
        )

    def __call__(self, waveform: jnp.ndarray, affine=None) -> jnp.ndarray:
        if self.cfg.impl == "pallas":
            from audioset_convnext_inf_tpu.ops.pallas_frontend import (
                fused_log_mel_spectrogram,
            )

            return fused_log_mel_spectrogram(
                waveform, self.cfg, self.mel_weights,
                compute_dtype=self.compute_dtype, affine=affine,
            )
        return log_mel_spectrogram(
            waveform, self.cfg, self.mel_weights,
            compute_dtype=self.compute_dtype, affine=affine,
        )
