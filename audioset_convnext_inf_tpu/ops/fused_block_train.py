"""Trainable fused ConvNeXt block: fused forward + fused backward kernels.

Couples ``pallas_fused_block.fused_block_hwbc`` (forward with the dwconv
output saved) and ``pallas_fused_block_bwd.fused_block_bwd_hwbc`` into one
``jax.custom_vjp`` so the TRAINING step runs stages 3-4 through the fused
HWBC kernels - forward hides the MLP GEMMs behind the 7x7 VPU stencil,
backward hides the 5 gradient GEMMs behind the dgrad/wgrad stencils.

Semantics (reference block, pytorch/convnext.py:58-87, tanh GELU, with
per-sample drop-path scale s):

    y = x + s * gamma * pwconv2(gelu(pwconv1(LN(dwconv(x)))))

Residuals stored: (x, d=dwconv(x)) - LN statistics and the GELU hidden are
recomputed in the backward kernel (storing the 4C hidden is impossible at
flagship sizes, NOTES.md), which is the same memory class as XLA's own
GELU-remat backward.

``fused_train_supported`` gates on the backward kernel's DMA geometry
(n_h >= 2, ht >= 3, ht_last >= 3 per stage height); callers fall back to
the plain XLA block path when unsupported.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.ops.pallas_fused_block import fused_block_hwbc
from audioset_convnext_inf_tpu.ops.pallas_fused_block_bwd import (
    P,
    fused_block_bwd_hwbc,
)

Array = jnp.ndarray


class FusedTrainTiles(NamedTuple):
    """Static tile config: forward (ht, mrows, wch) + backward (ht, mrows)."""

    eps: float
    fwd_ht: int
    fwd_mrows: int
    fwd_wch: int
    bwd_ht: int
    bwd_mrows: int = 1


def bwd_geometry_ok(H: int, ht: int) -> bool:
    n_h = -(-H // ht)
    ht_last = H - (n_h - 1) * ht
    return n_h >= 2 and ht >= P and ht_last >= P


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_block_train(tiles: FusedTrainTiles, x: Array, dw_w: Array,
                      dw_b: Array, ln_scale: Array, ln_bias: Array,
                      w1: Array, b1: Array, w2: Array, b2: Array,
                      gamma: Array, s: Array) -> Array:
    y, _ = _fwd(tiles, x, dw_w, dw_b, ln_scale, ln_bias,
                w1, b1, w2, b2, gamma, s)
    return y


def _fwd(tiles, x, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma, s):
    y, d = fused_block_hwbc(
        x, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma,
        eps=tiles.eps, ht=tiles.fwd_ht, mrows=tiles.fwd_mrows,
        wch=tiles.fwd_wch, save_dwconv=True, s=s)
    return y, (x, d, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma, s)


def _bwd(tiles, res, dy):
    x, d, dw_w, dw_b, ln_scale, ln_bias, w1, b1, w2, b2, gamma, s = res
    dx, g = fused_block_bwd_hwbc(
        x, d, dy, dw_w, ln_scale, ln_bias, w1, b1, w2, b2, gamma, s,
        eps=tiles.eps, ht=tiles.bwd_ht, mrows=tiles.bwd_mrows)
    return (dx,
            g["dwconv"]["w"].reshape(dw_w.shape).astype(dw_w.dtype),
            g["dwconv"]["b"].astype(dw_b.dtype),
            g["norm"]["scale"].astype(ln_scale.dtype),
            g["norm"]["bias"].astype(ln_bias.dtype),
            g["pwconv1"]["w"].astype(w1.dtype),
            g["pwconv1"]["b"].astype(b1.dtype),
            g["pwconv2"]["w"].astype(w2.dtype),
            g["pwconv2"]["b"].astype(b2.dtype),
            g["gamma"].astype(gamma.dtype),
            jnp.zeros_like(s))  # drop-path mask is not differentiated


fused_block_train.defvjp(_fwd, _bwd)
