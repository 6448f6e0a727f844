"""Waveform-level augmentations, jittable under a PRNG key.

Behavioral equivalents of pytorch/augmentations.py:

 - :func:`crop`  / :func:`pad`  - 4 alignments each (augmentations.py:16-203)
 - :func:`resample_nearest`     - nearest-index resampling (:266-275)
 - :func:`resample_linear`      - the Resample class's "linear" mode
                                  (:244-258): windowed-sinc polyphase
                                  resampling with torchaudio's
                                  sinc_interp_hann semantics, host-side
 - :func:`resample`             - Resample(interpolation=...) dispatcher
 - :func:`speed_perturb`        - resample + pad + crop to original length,
                                  rate ~ U(rates), applied with prob p (:278-329)
 - :func:`gain_augment`         - "pydub" +-N dB random gain (:336-341)
 - :func:`roll_augment`         - circular shift +-shift_range (:344-351)

Static-shape discipline: TPU kernels cannot have data-dependent output
shapes, so ``speed_perturb`` composes the variable-rate resample and the
pad/crop into a single gather with a fixed output length - semantically the
reference's stretch -> Pad(align) -> Crop(align) chain (align='random' by
default, matching SpeedPerturbation's defaults) expressed as index
arithmetic with traced offsets.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def crop(x: Array, target_length: int, align: str = "left", key: jax.Array | None = None) -> Array:
    """Crop trailing axis to target_length (identity if already shorter)."""
    length = x.shape[-1]
    if length <= target_length:
        return x
    diff = length - target_length
    if align == "left":
        start = 0
    elif align == "right":
        start = diff
    elif align == "center":
        start = diff // 2 + diff % 2
    elif align == "random":
        if key is None:
            raise ValueError("align='random' requires a PRNG key")
        start = jax.random.randint(key, (), 0, diff)
        return jax.lax.dynamic_slice_in_dim(x, start, target_length, axis=-1)
    else:
        raise ValueError(f"unknown align {align!r}")
    return jax.lax.slice_in_dim(x, start, start + target_length, axis=-1)


def pad(
    x: Array,
    target_length: int,
    align: str = "left",
    fill_value: float = 0.0,
    key: jax.Array | None = None,
) -> Array:
    """Pad trailing axis to target_length (identity if already longer)."""
    length = x.shape[-1]
    missing = max(target_length - length, 0)
    if missing == 0:
        return x
    if align == "left":
        left, right = 0, missing
    elif align == "right":
        left, right = missing, 0
    elif align == "center":
        left = missing // 2 + missing % 2
        right = missing // 2
    elif align == "random":
        if key is None:
            raise ValueError("align='random' requires a PRNG key")
        left = jax.random.randint(key, (), 0, missing + 1)
        # static-shape version: place x into a zero buffer at dynamic offset
        buf = jnp.full(x.shape[:-1] + (target_length,), fill_value, x.dtype)
        return jax.lax.dynamic_update_slice_in_dim(buf, x, left, axis=-1)
    else:
        raise ValueError(f"unknown align {align!r}")
    pads = [(0, 0)] * (x.ndim - 1) + [(left, right)]
    return jnp.pad(x, pads, constant_values=fill_value)


def pad_or_truncate(x: Array, target_length: int) -> Array:
    """Host/device-agnostic pad-with-zeros or left-crop (utilities.py:230-235)."""
    return crop(pad(x, target_length), target_length)


def resample_nearest_indices(length: int, rate: Array, out_length: int) -> Array:
    """Indices of the nearest-neighbor resample at traced ``rate``.

    index[i] = clip(round(i / rate), 0, length-1); positions beyond the
    stretched signal map to the marker length (callers mask them to 0).
    """
    i = jnp.arange(out_length, dtype=jnp.float32)
    idx = jnp.round(i / rate).astype(jnp.int32)
    return idx


def speed_perturb(
    key: jax.Array,
    x: Array,
    rates: Tuple[float, float] = (0.5, 1.5),
    p: float = 0.5,
    align: str = "random",
) -> Array:
    """Speed perturbation with 'same'-length output (augmentations.py:278-329).

    rate ~ U(rates); the nearest-neighbor stretch yields ceil(L*rate) samples
    (reference ``resample_nearest``: indexes = arange(0, L, 1/rate)). rate<1
    shortens the signal -> Pad(align); rate>1 lengthens it -> Crop(align).
    ``align='random'`` matches SpeedPerturbation's default: pad offset
    ~ U{0..missing} inclusive (pad_align_random), crop start ~ U{0..diff-1}
    exclusive (crop_align_random). Output index i reads stretched sample
    j = i - pad_left + crop_start, zero outside [0, stretched_len).
    """
    pkey, rkey, akey = jax.random.split(key, 3)
    length = x.shape[-1]
    rate = jax.random.uniform(rkey, (), minval=rates[0], maxval=rates[1])
    stretched_len = jnp.ceil(length * rate).astype(jnp.int32)
    missing = jnp.maximum(length - stretched_len, 0)  # pad amount (rate < 1)
    diff = jnp.maximum(stretched_len - length, 0)  # crop amount (rate > 1)
    if align == "left":
        pad_left = jnp.zeros((), jnp.int32)
        crop_start = jnp.zeros((), jnp.int32)
    elif align == "right":
        pad_left, crop_start = missing, diff
    elif align == "center":
        pad_left = missing // 2 + missing % 2
        crop_start = diff // 2 + diff % 2
    elif align == "random":
        pkey_pad, pkey_crop = jax.random.split(akey)
        pad_left = jax.random.randint(pkey_pad, (), 0, missing + 1)
        crop_start = jax.random.randint(pkey_crop, (), 0, jnp.maximum(diff, 1))
    else:
        raise ValueError(f"unknown align {align!r}")
    j = jnp.arange(length, dtype=jnp.int32) - pad_left + crop_start
    valid = (j >= 0) & (j < stretched_len)
    # stretched[j] = x[clip(round(j / rate), 0, L-1)]
    src = jnp.clip(jnp.round(j.astype(jnp.float32) / rate).astype(jnp.int32), 0, length - 1)
    out = jnp.take(x, src, axis=-1) * valid.astype(x.dtype)
    apply = jax.random.uniform(pkey, ()) <= p
    return jnp.where(apply, out, x)


def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
):
    """Polyphase windowed-sinc kernel bank (torchaudio sinc_interp_hann
    semantics, the backend of the reference Resample class's "linear"
    interpolation mode, augmentations.py:253-258).

    For gcd-reduced integer rates (orig_freq -> new_freq), phase p of the
    output interleave samples the continuous-time reconstruction at
    t = -p/new_freq relative to each input frame:

        w(t) = scale * sinc(pi * f_c * t) * cos(pi * f_c * t / (2W))^2,
        f_c = rolloff * min(orig, new),  |f_c * t| <= W,
        scale = f_c / orig_freq

    Returns (kernels (new_freq, 2*width + orig_freq) float32, width);
    built in f64, stored f32 (torchaudio's serving dtype - the bank is the
    memory cost, see resample_linear), and cached per rate pair.
    """
    import math

    import numpy as np

    g = math.gcd(int(orig_freq), int(new_freq))
    orig_freq, new_freq = int(orig_freq) // g, int(new_freq) // g
    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    idx = np.arange(-width, width + orig_freq, dtype=np.float64) / orig_freq
    t = np.arange(0, -new_freq, -1, dtype=np.float64)[:, None] / new_freq + idx
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t *= np.pi
    kernels = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernels *= window * (base_freq / orig_freq)
    return kernels.astype(np.float32), width


from functools import lru_cache as _lru_cache

sinc_resample_kernel = _lru_cache(maxsize=32)(sinc_resample_kernel)


def _cacheable_bank(orig_freq: int, new_freq: int,
                    lowpass_filter_width: int, rolloff: float,
                    max_elems: int = 2_000_000) -> bool:
    """Whether the (gcd-reduced) kernel bank is small enough to pin in the
    lru_cache: (new_freq, 2*width + orig_freq) float32 <= ~8 MB. Coprime
    rate pairs (continuous random rates) blow past this by 500x."""
    import math

    base_freq = min(orig_freq, new_freq) * rolloff
    width = math.ceil(lowpass_filter_width * orig_freq / base_freq)
    return new_freq * (2 * width + orig_freq) <= max_elems


def resample_linear(
    x,
    rate: float,
    sample_rate: int = 32000,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    quantize_hz: "int | None" = None,
):
    """The reference Resample class's "linear" mode (augmentations.py:
    244-258): resample from ``sample_rate`` to ``int(sample_rate * rate)``
    with a windowed-sinc polyphase filter (torchaudio Resample defaults:
    sinc_interp_hann, width 6, rolloff 0.99). Output length is
    ceil(L * new / orig).

    Host-side numpy (this is a data-plane augmentation applied per clip
    before batching; the hot loop is ONE GEMM - the padded signal framed at
    stride orig_freq against the (new_freq, taps) kernel bank - so BLAS,
    not Python, does the work). Trailing-axis only, 1-D or batched 2-D.

    Memory note: the kernel bank is (new/g, 2*width + orig/g) where
    g = gcd(orig, new). A continuously sampled rate makes new_freq nearly
    coprime with 32000 (the reference's torchaudio call pays the same
    cost), blowing the bank to ~GB scale. ``quantize_hz`` rounds the
    target rate to the nearest multiple (e.g. 100 -> bank <= ~2 MB, rate
    error <= 50/32000 = 0.16%) - the right setting for random-rate
    augmentation loops; None keeps exact reference semantics.
    """
    import math

    import numpy as np

    x = np.asarray(x)
    orig_freq = int(sample_rate)
    new_freq = int(sample_rate * rate)
    if quantize_hz:
        new_freq = max(quantize_hz, int(round(new_freq / quantize_hz)) * quantize_hz)
    if new_freq <= 0:
        raise ValueError(f"rate {rate} yields non-positive target rate")
    g = math.gcd(orig_freq, new_freq)
    orig_freq, new_freq = orig_freq // g, new_freq // g
    if orig_freq == new_freq:
        return x.astype(np.float32, copy=False)
    # Cache only small banks (quantized/repeated rates). A continuously
    # sampled rate is near-coprime with the source rate and its bank is
    # ~GB scale; pinning up to 32 of those in the lru_cache would leak
    # tens of GB of host RAM across a random-rate augmentation loop, so
    # big banks build uncached and free after the call (as torchaudio
    # does every call).
    builder = (sinc_resample_kernel
               if _cacheable_bank(orig_freq, new_freq, lowpass_filter_width,
                                  rolloff)
               else sinc_resample_kernel.__wrapped__)
    kernels, width = builder(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    squeeze = x.ndim == 1
    xb = x.reshape(-1, x.shape[-1]).astype(np.float64)
    n_wav, length = xb.shape
    target_length = math.ceil(new_freq * length / orig_freq)
    padded = np.pad(xb, ((0, 0), (width, width + orig_freq)))
    taps = kernels.shape[1]  # 2*width + orig_freq
    n_frames = (padded.shape[1] - taps) // orig_freq + 1
    frames = np.lib.stride_tricks.as_strided(
        padded,
        shape=(n_wav, n_frames, taps),
        strides=(padded.strides[0], orig_freq * padded.strides[1],
                 padded.strides[1]),
    )
    # (n_wav, n_frames, taps) @ (taps, new_freq) -> interleave phases
    out = frames @ kernels.T
    out = out.reshape(n_wav, -1)[:, :target_length].astype(np.float32)
    return out[0] if squeeze else out


def resample(
    x,
    rate: float,
    interpolation: str = "nearest",
    sample_rate: int = 32000,
):
    """Resample.process at a given rate (augmentations.py:243-263):
    ``nearest`` gathers round(i/rate) indices; ``linear`` runs the
    windowed-sinc polyphase path. Rate sampling (U(rates)) and the apply
    probability live with the caller, as keyed JAX randomness upstream."""
    import numpy as np

    if interpolation == "nearest":
        x = np.asarray(x)
        length = x.shape[-1]
        idx = np.round(np.arange(0, length, 1.0 / rate)).astype(np.int64)
        return np.take(x, np.minimum(idx, length - 1), axis=-1)
    if interpolation == "linear":
        return resample_linear(x, rate, sample_rate)  # exact; pass
        # quantize_hz via resample_linear directly for random-rate loops
    raise ValueError(
        f"invalid interpolation {interpolation!r}; must be one of "
        f"('nearest', 'linear')")


def gain_augment(key: jax.Array, x: Array, gain_db: int = 7) -> Array:
    """Random integer gain in [-gain_db, gain_db) dB (augmentations.py:336-341)."""
    gain = jax.random.randint(key, (), 0, gain_db * 2) - gain_db
    amp = 10.0 ** (gain.astype(jnp.float32) / 20.0)
    return x * amp.astype(x.dtype)


def roll_augment(key: jax.Array, x: Array, shift_range: int = 50) -> Array:
    """Circular shift by a random offset in [-shift_range, shift_range)."""
    shift = jax.random.randint(key, (), -shift_range, shift_range)
    return jnp.roll(x, shift, axis=-1)
