"""SpecAugment: per-sample time/frequency stripe dropout.

Behavioral match of torchlibrosa's ``SpecAugmentation`` (consumed at
reference convnext.py:205-210, 308-309): for each sample and each stripe,
draw ``width ~ U[0, drop_width)`` and ``begin ~ U[0, size - width)`` and zero
``x[..., begin:begin+width, ...]`` along the target axis.

TPU-native formulation: no dynamic slicing - stripes are realized as
broadcasted-iota comparison masks, so the whole op is elementwise and fuses
with the surrounding pipeline under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import SpecAugmentConfig

Array = jnp.ndarray


def _drop_stripes(key: jax.Array, x: Array, axis: int, drop_width: int, stripes_num: int) -> Array:
    """Zero ``stripes_num`` random stripes along ``axis``, per sample."""
    b = x.shape[0]
    size = x.shape[axis]
    wkey, bkey = jax.random.split(key)
    # width in [0, drop_width); begin in [0, size - width)
    widths = jax.random.randint(wkey, (b, stripes_num), 0, drop_width)
    u = jax.random.uniform(bkey, (b, stripes_num))
    begins = jnp.floor(u * (size - widths)).astype(jnp.int32)

    pos = jax.lax.broadcasted_iota(jnp.int32, (b, stripes_num, size), 2)
    stripe_mask = (pos >= begins[..., None]) & (pos < (begins + widths)[..., None])
    keep = ~jnp.any(stripe_mask, axis=1)  # (b, size)

    shape = [1] * x.ndim
    shape[0] = b
    shape[axis] = size
    return x * keep.reshape(shape).astype(x.dtype)


def spec_augment(
    key: jax.Array,
    x: Array,
    time_axis: int,
    freq_axis: int,
    cfg: SpecAugmentConfig = SpecAugmentConfig(),
) -> Array:
    """Apply time then frequency stripe dropout (training only)."""
    tkey, fkey = jax.random.split(key)
    x = _drop_stripes(tkey, x, time_axis, cfg.time_drop_width, cfg.time_stripes_num)
    x = _drop_stripes(fkey, x, freq_axis, cfg.freq_drop_width, cfg.freq_stripes_num)
    return x
