"""Fused Pallas log-mel frontend kernel.

One kernel computes, per (batch, time-tile) grid cell, entirely in VMEM:

    windowed frames (F, 1024)
      -> DFT GEMMs vs window-scaled cos/-sin bases (MXU, f32 HIGHEST)
      -> power = re^2 + im^2                          (VPU)
      -> mel GEMM (513->224, zero-padded to 640 lanes) (MXU)
      -> 10*log10(clip(., amin)) - ref offset          (VPU)

vs the unfused XLA pipeline this never materializes the (B, T, 513)
re/im/power intermediates in HBM (~6 MB/clip of round-trips saved); only
frames stream in and (T, 224) log-mels stream out. Numerics match
ops.frontend.log_mel_spectrogram (same bases, same HIGHEST-precision
dots - see that module for why precision matters in the log domain).

Framing itself stays in XLA (strided-reshape, fuses into the frame layout
transform); the kernel grid tiles frames in chunks of 128 with zero-padded
tail, sliced off afterwards.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from audioset_convnext_inf_tpu.config import FrontendConfig
from audioset_convnext_inf_tpu.ops.frontend import _dft_bases, frame_signal, mel_filterbank

_LANES = 128
_F_TILE = 128  # frames per grid cell
_INV_LN10 = float(1.0 / np.log(10.0))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=4)
def _padded_bases(n_fft: int, win_length: int, n_mels: int, sample_rate: int,
                  fmin: float, fmax: float):
    """(cos, sin) bases padded to lane-aligned freq count + matching mel.T."""
    cos_b, sin_b = _dft_bases(n_fft, win_length)  # (n_fft, 513)
    n_freq = cos_b.shape[1]
    n_freq_pad = _round_up(n_freq, _LANES)  # 513 -> 640
    pad = ((0, 0), (0, n_freq_pad - n_freq))
    cos_p = np.pad(cos_b, pad)
    sin_p = np.pad(sin_b, pad)
    mel = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)  # (n_mels, 513)
    mel_t = np.pad(mel.T, ((0, n_freq_pad - n_freq), (0, 0)))  # (640, n_mels)
    return jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_t)


def _logmel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, a_ref, b_ref, out_ref,
                   *, amin: float, db_offset: float):
    f = frames_ref[0]  # (F_TILE, n_fft) float32
    dn = (((1,), (0,)), ((), ()))
    re = jax.lax.dot_general(
        f, cos_ref[:], dn, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    im = jax.lax.dot_general(
        f, sin_ref[:], dn, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    power = re * re + im * im  # (F_TILE, n_freq_pad); padded cols are 0
    mel_power = jax.lax.dot_general(
        power, mel_ref[:], dn, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    log_spec = 10.0 * _INV_LN10 * jnp.log(jnp.maximum(mel_power, amin))
    # optional fused per-mel-bin affine (eval-mode bn0 fold): stays in VMEM
    # instead of a second HBM pass over the (B, T, n_mels) log-mels
    out_ref[0] = (log_spec - db_offset) * a_ref[0] + b_ref[0]


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_log_mel_spectrogram(
    waveform: jnp.ndarray,
    cfg: FrontendConfig,
    mel_weights: Optional[jnp.ndarray] = None,  # unused: bases derive from cfg
    compute_dtype=jnp.float32,
    affine=None,
) -> jnp.ndarray:
    """(B, num_samples) -> (B, 1, T, n_mels); drop-in for
    ops.frontend.log_mel_spectrogram with the fused kernel. ``affine=(a, b)``
    fuses the eval-mode bn0 per-mel-bin scale/shift into the kernel."""
    del mel_weights
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    b, n = waveform.shape
    num_frames = cfg.num_frames(n)
    x = waveform.astype(jnp.float32)
    if cfg.center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length, num_frames)  # (B, T, n_fft)

    t_pad = _round_up(num_frames, _F_TILE)
    if t_pad != num_frames:
        frames = jnp.pad(frames, ((0, 0), (0, t_pad - num_frames), (0, 0)))

    cos_p, sin_p, mel_t = _padded_bases(
        cfg.n_fft, cfg.win_length, cfg.n_mels, cfg.sample_rate, cfg.fmin, cfg.fmax
    )
    n_freq_pad = cos_p.shape[1]
    db_offset = 10.0 * float(np.log10(max(cfg.amin, cfg.ref)))
    if affine is not None:
        aff_a = jnp.asarray(affine[0], jnp.float32)[None, :]
        aff_b = jnp.asarray(affine[1], jnp.float32)[None, :]
    else:
        aff_a = jnp.ones((1, cfg.n_mels), jnp.float32)
        aff_b = jnp.zeros((1, cfg.n_mels), jnp.float32)

    grid = (b, t_pad // _F_TILE)
    out = pl.pallas_call(
        functools.partial(_logmel_kernel, amin=cfg.amin, db_offset=db_offset),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _F_TILE, cfg.n_fft), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, n_freq_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cfg.n_fft, n_freq_pad), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freq_pad, cfg.n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cfg.n_mels), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _F_TILE, cfg.n_mels), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, cfg.n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * t_pad * cfg.n_fft * n_freq_pad * 2 + 2 * b * t_pad * n_freq_pad * cfg.n_mels,
            bytes_accessed=b * t_pad * (cfg.n_fft + cfg.n_mels) * 4,
            transcendentals=b * t_pad * cfg.n_mels,
        ),
        interpret=_use_interpret(),
    )(frames, cos_p, sin_p, mel_t, aff_a, aff_b)

    if cfg.top_db is not None:
        assert affine is None, "top_db clamping must precede the bn0 affine"
        out = jnp.maximum(out, jnp.max(out) - cfg.top_db)
    return out[:, None, :num_frames, :]
