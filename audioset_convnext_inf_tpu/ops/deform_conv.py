"""Modulated deformable convolution v2 as bilinear gather + matmul.

TPU-native replacement for ``torchvision.ops.deform_conv2d`` as used by the
reference's DeformableConv2d (models.py:202-265): a zero-initialized offset
conv and modulator conv predict per-tap sampling offsets Dp_k and masks m_k,
and the output is

    out(p) = sum_k w_k . x(p + p_k + Dp_k) . m_k

There is no CUDA op to call on TPU; instead each kernel tap is a batched
bilinear gather (4 corner lookups, static k*k loop) followed by one
(H*W, k*k*C) @ (k*k*C, O) matmul on the MXU. Zero offsets reproduce the
regular convolution exactly (tested), matching deform_conv2d semantics with
zero padding outside the feature map.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _bilinear_gather(x: Array, y: Array, xq: Array) -> Array:
    """Sample x (B, H, W, C) at float coords y/xq (B, H', W') with zero pad.

    Returns (B, H', W', C).
    """
    b, h, w, c = x.shape

    y0 = jnp.floor(y)
    x0 = jnp.floor(xq)
    wy = y - y0
    wx = xq - x0

    def corner(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat_idx = yc * w + xc  # (B, H', W')
        flat = x.reshape(b, h * w, c)
        vals = jnp.take_along_axis(
            flat, flat_idx.reshape(b, -1, 1), axis=1
        ).reshape(flat_idx.shape + (c,))
        return vals * inb[..., None].astype(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    wy = wy[..., None].astype(x.dtype)
    wx = wx[..., None].astype(x.dtype)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_conv2d(
    x: Array,  # (B, H, W, C) NHWC
    offset: Array,  # (B, H, W, 2*kh*kw) - (dy, dx) interleaved per tap
    weight: Array,  # (kh, kw, C, O) HWIO
    bias: Optional[Array] = None,
    mask: Optional[Array] = None,  # (B, H, W, kh*kw) modulation
    padding: Tuple[int, int] = (1, 1),
) -> Array:
    """Stride-1 modulated deformable conv (torchvision v2 semantics)."""
    b, h, w, c = x.shape
    kh, kw, _, out_ch = weight.shape
    n_taps = kh * kw
    ph, pw = padding

    rows = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    cols = jnp.arange(w, dtype=jnp.float32)[None, None, :]

    patches = []
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            dy = offset[..., 2 * t].astype(jnp.float32)
            dx = offset[..., 2 * t + 1].astype(jnp.float32)
            y = rows + (i - ph) + dy
            xq = cols + (j - pw) + dx
            v = _bilinear_gather(x, y, xq)  # (B, H, W, C)
            if mask is not None:
                v = v * mask[..., t : t + 1].astype(v.dtype)
            patches.append(v)
    stacked = jnp.concatenate(patches, axis=-1)  # (B, H, W, taps*C), tap-major
    wmat = weight.reshape(n_taps * c, out_ch)  # HWIO flatten = tap-major too
    out = jnp.einsum(
        "bhwk,ko->bhwo", stacked, wmat.astype(stacked.dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias
    return out.astype(x.dtype)
