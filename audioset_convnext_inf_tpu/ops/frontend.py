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

This XLA GEMM pipeline IS the production frontend: a fused Pallas frontend
kernel was built and measured slower (rounds 1-2 negative result, NOTES.md
"Negative results"), so it was deleted in round 3.
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


# ---------------------------------------------------------------------------
# Two-stage Cooley-Tukey GEMM-DFT
# ---------------------------------------------------------------------------


def _ct_factors(n_fft: int) -> Optional[Tuple[int, int]]:
    """Split n_fft = P*Q with P even and as square as possible (1024 -> 32*32,
    512 -> 16*32). Returns None when no suitable factorization exists."""
    best = None
    p = 2
    while p * p <= n_fft:
        if n_fft % p == 0 and p % 2 == 0:
            best = (p, n_fft // p)
        p += 1
    return best


@lru_cache(maxsize=8)
def _ct_bases(n_fft: int, win_length: int):
    """Constants for the two-stage DFT (float64 -> float32).

    With n = P*n2 + n1 (n1 < P, n2 < Q) and k = Q*q + r (r < Q, q <= P/2):
        I[n1, r]  = sum_n2 x[P n2 + n1] W_Q^{n2 r}          (inner, GEMM)
        J[r, n1]  = W_N^{n1 r} I[n1, r]                      (twiddle)
        X[Qq + r] = sum_n1 J[r, n1] W_P^{n1 q}               (outer, GEMM)
    Returns (P, Q, window, CQ, SQ, TR, TI, CP, SP): inner bases (Q, Q),
    twiddles (Q, P) indexed [r, n1], outer bases (P, P//2+1).
    """
    pq = _ct_factors(n_fft)
    assert pq is not None, n_fft
    P, Q = pq
    window = hann_window_periodic(win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = np.pad(window, (lpad, n_fft - win_length - lpad))

    n2 = np.arange(Q, dtype=np.float64)
    r = np.arange(Q, dtype=np.float64)
    ang_q = 2.0 * np.pi * n2[:, None] * r[None, :] / Q
    CQ, SQ = np.cos(ang_q), -np.sin(ang_q)

    n1 = np.arange(P, dtype=np.float64)
    ang_t = 2.0 * np.pi * r[:, None] * n1[None, :] / n_fft
    TR, TI = np.cos(ang_t), -np.sin(ang_t)

    q = np.arange(P // 2 + 1, dtype=np.float64)
    ang_p = 2.0 * np.pi * n1[:, None] * q[None, :] / P
    CP, SP = np.cos(ang_p), -np.sin(ang_p)

    f32 = np.float32
    return (P, Q, window.astype(f32), CQ.astype(f32), SQ.astype(f32),
            TR.astype(f32), TI.astype(f32), CP.astype(f32), SP.astype(f32))


def ct_bin_to_k(n_fft: int) -> np.ndarray:
    """Map CT output order to frequency bins: flat index r*(P//2+1)+q holds
    bin k = Q*q + r; entries with k > n_fft//2 are duplicates outside the
    one-sided spectrum and map to -1 (their mel weight is zeroed)."""
    P, Q = _ct_factors(n_fft)
    nq = P // 2 + 1
    out = np.full(Q * nq, -1, np.int64)
    for rr in range(Q):
        for qq in range(nq):
            k = Q * qq + rr
            if k <= n_fft // 2:
                out[rr * nq + qq] = k
    return out


def power_spectrogram_ct(
    waveform: jnp.ndarray, cfg: FrontendConfig, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """Two-stage GEMM-DFT power spectrum in CT bin order.

    Returns (B, T, Q*(P//2+1)) where flat index r*(P//2+1)+q is bin Q*q+r
    (see ct_bin_to_k). Same math as power_spectrogram, ~7x fewer MXU FLOPs
    at n_fft=1024, and MORE accurate (max rel 5e-4 vs 1.9e-3 against f64 -
    shorter accumulation chains); consumers fold the reorder into their
    next matmul.

    Measured on v5e: SLOWER than the direct GEMM (21 vs 10 ms at B=128) -
    the 32-wide intermediates pad to 128 lanes and the non-minor
    contractions transpose, eating the FLOP advantage. Kept as the
    high-accuracy reference and for CPU use; serving stays on "direct"
    (NOTES.md round-2 negative results).
    """
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    b, n = waveform.shape
    num_frames = cfg.num_frames(n)
    pad = cfg.n_fft // 2
    if cfg.center:
        waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, num_frames)
    P, Q, window, CQ, SQ, TR, TI, CP, SP = _ct_bases(cfg.n_fft, cfg.win_length)
    prec = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[cfg.precision]

    x = frames.astype(jnp.float32) * jnp.asarray(window)
    x = x.reshape(b, num_frames, Q, P)  # [n2, n1]
    dot = partial(jnp.einsum, precision=prec, preferred_element_type=jnp.float32)
    ir = dot("btnp,nr->btrp", x, jnp.asarray(CQ))  # (B, T, r, n1)
    ii = dot("btnp,nr->btrp", x, jnp.asarray(SQ))
    jr = ir * jnp.asarray(TR) - ii * jnp.asarray(TI)
    ji = ir * jnp.asarray(TI) + ii * jnp.asarray(TR)
    xr = dot("btrp,pq->btrq", jr, jnp.asarray(CP)) - dot("btrp,pq->btrq", ji, jnp.asarray(SP))
    xi = dot("btrp,pq->btrq", jr, jnp.asarray(SP)) + dot("btrp,pq->btrq", ji, jnp.asarray(CP))
    power = xr * xr + xi * xi
    return power.reshape(b, num_frames, Q * (P // 2 + 1))


@lru_cache(maxsize=8)
def _conv_dft_kernel(n_fft: int, win_length: int, hop: int) -> np.ndarray:
    """Window-scaled DFT bases as a 1-D conv kernel over hop-sized blocks.

    (J, hop, 2*(n_fft//2+1)) HIO kernel with J = ceil(n_fft / hop): frame i
    of the STFT is blocks[i : i+J] contracted against this kernel (rows past
    n_fft zero-padded), cos bins first then -sin bins.
    """
    cos_b, sin_b = _dft_bases(n_fft, win_length)
    basis = np.concatenate([cos_b, sin_b], axis=1)  # (n_fft, 2*n_freqs)
    j_taps = -(-n_fft // hop)
    kern = np.zeros((j_taps, hop, basis.shape[1]), np.float32)
    for j in range(j_taps):
        seg = basis[j * hop : min((j + 1) * hop, n_fft)]
        kern[j, : seg.shape[0]] = seg
    return kern


def power_spectrogram_conv(
    waveform: jnp.ndarray, cfg: FrontendConfig, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """Power spectrum via one strided 1-D convolution (serving default).

    Same math as power_spectrogram, reformulated for the TPU: reshape the
    padded waveform into hop-sized blocks (B, nb, hop) and run a single
    kernel-size-ceil(n_fft/hop) conv with Cin=hop, Cout=2*(n_fft//2+1) -
    XLA's conv lowering does the frame overlap implicitly, so the three
    hop-shifted frame copies the GEMM formulation materializes (a ~2.8 ms
    data-formatting bucket at B=128) never exist. Numerics: identical
    contraction length, within a rounding reordering of the GEMM path.
    """
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    b, n = waveform.shape
    num_frames = cfg.num_frames(n)
    pad = cfg.n_fft // 2
    hop = cfg.hop_length
    kern = _conv_dft_kernel(cfg.n_fft, cfg.win_length, hop)
    j_taps = kern.shape[0]
    blocks_needed = num_frames + j_taps - 1
    padded_len = blocks_needed * hop
    # One pad covers both the reflect centering AND the block-alignment
    # tail: every real frame's n_fft window lies within the n + 2*pad
    # centered samples, and the tail rows of the conv kernel past n_fft are
    # zero, so the tail's VALUES are inert - extending the reflect pad is
    # exactly as correct as a second zero-pad, and saves one full
    # (B, 320k)-sized copy on the serving hot path (~0.5 ms at B=128).
    if cfg.center:
        tail = max(0, padded_len - (n + 2 * pad))
        if cfg.pad_mode != "constant" and pad + tail >= n:
            tail = 0  # reflect width must stay < n; short clips re-pad below
        waveform = jnp.pad(waveform, ((0, 0), (pad, pad + tail)), mode=cfg.pad_mode)
    x = waveform
    if padded_len > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, padded_len - x.shape[1])))
    blocks = x[:, :padded_len].reshape(b, blocks_needed, hop)
    prec = {"highest": jax.lax.Precision.HIGHEST, "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT}[cfg.precision]
    y = jax.lax.conv_general_dilated(
        blocks.astype(jnp.float32), jnp.asarray(kern),
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=prec, preferred_element_type=jnp.float32,
    )[:, :num_frames]
    n_freqs = cfg.n_fft // 2 + 1
    re, im = y[..., :n_freqs], y[..., n_freqs:]
    return re * re + im * im


def power_spectrogram_rfft(
    waveform: jnp.ndarray, cfg: FrontendConfig, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """Power spectrum via XLA's native real FFT (dft_impl="rfft").

    Frames with the strided-reshape framer, windows, and runs
    ``jnp.fft.rfft`` - an exact f32 FFT, so it needs no precision knob and
    is the most accurate device path (the GEMM formulations trade accuracy
    for MXU throughput at precision("high")). Speed is measured per
    backend: see NOTES.md for the v5e whole-model A/B against "conv".
    """
    if waveform.ndim == 1:
        waveform = waveform[None, :]
    b, n = waveform.shape
    num_frames = cfg.num_frames(n)
    pad = cfg.n_fft // 2
    if cfg.center:
        waveform = jnp.pad(waveform, ((0, 0), (pad, pad)), mode=cfg.pad_mode)
    frames = frame_signal(waveform, cfg.n_fft, cfg.hop_length, num_frames)
    window = hann_window_periodic(cfg.win_length)
    if cfg.win_length < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win_length) // 2
        window = np.pad(window, (lpad, cfg.n_fft - cfg.win_length - lpad))
    spec = jnp.fft.rfft(frames.astype(jnp.float32) * jnp.asarray(window, jnp.float32))
    return spec.real * spec.real + spec.imag * spec.imag


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
    if cfg.dft_impl == "ct" and _ct_factors(cfg.n_fft) is not None:
        power = power_spectrogram_ct(waveform, cfg, compute_dtype=compute_dtype)
        # fold the CT bin reorder into the mel matrix: column i of the
        # CT-ordered power holds bin k=ct_bin_to_k[i] (or a discarded
        # duplicate when -1, which gets zero weight)
        k_of = ct_bin_to_k(cfg.n_fft)
        mw = jnp.asarray(mel_weights)
        mel_weights = jnp.where(
            jnp.asarray(k_of)[None, :] >= 0,
            mw[:, jnp.clip(jnp.asarray(k_of), 0)],
            0.0,
        )
    elif cfg.dft_impl == "conv":
        power = power_spectrogram_conv(waveform, cfg, compute_dtype=compute_dtype)
    elif cfg.dft_impl == "rfft":
        power = power_spectrogram_rfft(waveform, cfg, compute_dtype=compute_dtype)
    else:
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
        return log_mel_spectrogram(
            waveform, self.cfg, self.mel_weights,
            compute_dtype=self.compute_dtype, affine=affine,
        )
