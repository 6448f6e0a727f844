"""Waveform-level augmentations, jittable under a PRNG key.

Behavioral equivalents of pytorch/augmentations.py:

 - :func:`crop`  / :func:`pad`  - 4 alignments each (augmentations.py:16-203)
 - :func:`resample_nearest`     - nearest-index resampling (:266-275)
 - :func:`speed_perturb`        - resample + pad + crop to original length,
                                  rate ~ U(rates), applied with prob p (:278-329)
 - :func:`gain_augment`         - "pydub" +-N dB random gain (:336-341)
 - :func:`roll_augment`         - circular shift +-shift_range (:344-351)

Static-shape discipline: TPU kernels cannot have data-dependent output
shapes, so ``speed_perturb`` composes the variable-rate resample and the
pad/crop into a single gather with a fixed output length - semantically the
resample-then-pad/crop of the reference with align='left' behavior expressed
as index arithmetic.
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
) -> Array:
    """Speed perturbation with 'same'-length output (augmentations.py:278-329).

    rate ~ U(rates). rate>1 speeds up (signal shortens -> zero-pad tail);
    rate<1 slows down (signal lengthens -> crop). Fixed output length keeps
    the op jittable; 'left' alignment (the stretched signal starts at 0).
    """
    pkey, rkey = jax.random.split(key)
    length = x.shape[-1]
    rate = jax.random.uniform(rkey, (), minval=rates[0], maxval=rates[1])
    stretched_len = jnp.floor(length * rate).astype(jnp.int32)  # samples available
    idx = resample_nearest_indices(length, rate, length)
    valid = idx < length
    gathered = jnp.take(x, jnp.clip(idx, 0, length - 1), axis=-1)
    # zero out positions that would come from beyond the original signal
    pos = jnp.arange(length)
    in_range = pos < stretched_len
    mask = (valid & in_range).astype(x.dtype)
    out = gathered * mask
    apply = jax.random.uniform(pkey, ()) <= p
    return jnp.where(apply, out, x)


def gain_augment(key: jax.Array, x: Array, gain_db: int = 7) -> Array:
    """Random integer gain in [-gain_db, gain_db) dB (augmentations.py:336-341)."""
    gain = jax.random.randint(key, (), 0, gain_db * 2) - gain_db
    amp = 10.0 ** (gain.astype(jnp.float32) / 20.0)
    return x * amp.astype(x.dtype)


def roll_augment(key: jax.Array, x: Array, shift_range: int = 50) -> Array:
    """Circular shift by a random offset in [-shift_range, shift_range)."""
    shift = jax.random.randint(key, (), -shift_range, shift_range)
    return jnp.roll(x, shift, axis=-1)
