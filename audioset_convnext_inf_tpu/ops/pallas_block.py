"""Fused ConvNeXt block tail kernel: LN -> MLP -> layer-scale -> residual.

XLA executes the block tail (reference convnext.py:78-86) as five separate
HBM-roundtripping kernels - LayerNorm, GEMM1, GELU, GEMM2, scale+residual -
with the 4C-wide hidden activation written to and re-read from HBM. This
Pallas kernel keeps everything for a token tile in VMEM:

    out_tile = res_tile + gamma * (gelu(LN(x_tile) @ W1 + b1) @ W2 + b2)

cutting per-block HBM traffic from ~(10 + 8*expansion)*C bytes/token to
3*C reads+writes. The 7x7 depthwise conv stays in XLA (its conv lowering is
already near memory-bound) and fuses with this kernel's input read.

Token-tiled: x is viewed as (tokens, C); the grid walks width-adaptive
token tiles (_tok_tile: 4096 tokens at C=96 down to 512 at C=768) with
weights resident in VMEM. f32 LN statistics, bf16/f32 GEMMs on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

def _tok_tile(hidden: int) -> int:
    """Token-tile size: scale inversely with the MLP hidden width so every
    grid step feeds the MXU a substantial matmul. At hidden=384 (stage 1) a
    fixed 256-token tile meant ~7k grid steps of (256x96)@(96x384) -
    per-step overhead and MXU underutilization dominated the whole model
    (measured: stages 1+2 were 63% of forward time). Cap the f32 hidden
    accumulator at ~6 MB of VMEM."""
    t = 256
    while t < 4096 and (2 * t) * hidden * 4 <= 6 * 1024 * 1024:
        t *= 2
    return t


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(x_ref, res_ref, scale_ref, bias_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            gamma_ref, out_ref, *, eps: float, approx_gelu: bool):
    x = x_ref[:].astype(jnp.float32)  # (T, C)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    mean_sq = jnp.mean(x * x, axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale_ref[:] + bias_ref[:]

    dtype = x_ref.dtype
    h = jax.lax.dot_general(
        xn.astype(dtype), w1_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[:]
    # Mosaic has no erf/erfc lowering, so the kernel always uses the tanh
    # GELU. Its deviation from exact-erf GELU (<=1.1e-3 absolute) is below
    # bfloat16 rounding; the XLA block path keeps exact erf for f32 parity.
    del approx_gelu
    h = jax.nn.gelu(h, approximate=True).astype(dtype)
    y = jax.lax.dot_general(
        h, w2_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:]
    y = y * gamma_ref[:]
    out_ref[:] = (res_ref[:].astype(jnp.float32) + y).astype(out_ref.dtype)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_ln_mlp_residual(
    x: Array,  # dwconv output, (..., C)
    residual: Array,  # block input, same shape
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,  # (C, 4C)
    b1: Array,
    w2: Array,  # (4C, C)
    b2: Array,
    gamma: Optional[Array],
    eps: float = 1e-6,
    approx_gelu: bool = False,
) -> Array:
    """Drop-in for the block tail; any leading shape, trailing C."""
    orig_shape = x.shape
    c = orig_shape[-1]
    hidden = w1.shape[-1]
    tokens = int(np.prod(orig_shape[:-1]))
    tile = _tok_tile(hidden)
    t_pad = _round_up(tokens, tile)

    x2 = x.reshape(tokens, c)
    r2 = residual.reshape(tokens, c)
    if t_pad != tokens:
        x2 = jnp.pad(x2, ((0, t_pad - tokens), (0, 0)))
        r2 = jnp.pad(r2, ((0, t_pad - tokens), (0, 0)))

    dtype = x.dtype
    g = gamma if gamma is not None else jnp.ones((c,), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, approx_gelu=approx_gelu),
        grid=(t_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, c), dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_pad * c * hidden * 2,
            bytes_accessed=3 * t_pad * c * x2.dtype.itemsize,
            transcendentals=t_pad * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(
        x2,
        r2,
        jnp.asarray(ln_scale, jnp.float32)[None, :],
        jnp.asarray(ln_bias, jnp.float32)[None, :],
        w1.astype(dtype),
        jnp.asarray(b1, jnp.float32)[None, :],
        w2.astype(dtype),
        jnp.asarray(b2, jnp.float32)[None, :],
        jnp.asarray(g, jnp.float32)[None, :],
    )
    return out[:tokens].reshape(orig_shape)


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, XLA-math backward
# ---------------------------------------------------------------------------


def _tail_reference_math(x, residual, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps):
    """Same math as the kernel (incl. tanh GELU) in plain XLA - used to
    derive the backward pass via jax.vjp."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = (xn * ln_scale + ln_bias).astype(x.dtype)
    h = jnp.einsum("...c,cd->...d", xn, w1.astype(x.dtype),
                   preferred_element_type=jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=True).astype(x.dtype)
    y = jnp.einsum("...d,dc->...c", h, w2.astype(x.dtype),
                   preferred_element_type=jnp.float32) + b2
    y = y * gamma
    return (residual.astype(jnp.float32) + y).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def fused_ln_mlp_residual_trainable(x, residual, ln_scale, ln_bias, w1, b1, w2,
                                    b2, gamma, eps=1e-6):
    """Differentiable fused tail: Pallas kernel forward, XLA backward.

    The backward recomputes the (cheap relative to backward) forward in XLA
    via jax.vjp of the identical tanh-GELU math, so training gets the fused
    forward without a hand-written backward kernel. ``gamma`` must be a
    concrete array here (pass ones for gamma-less blocks).
    """
    return fused_ln_mlp_residual(x, residual, ln_scale, ln_bias, w1, b1, w2,
                                 b2, gamma, eps=eps)


def _tail_fwd(x, residual, ln_scale, ln_bias, w1, b1, w2, b2, gamma, eps):
    out = fused_ln_mlp_residual(x, residual, ln_scale, ln_bias, w1, b1, w2,
                                b2, gamma, eps=eps)
    return out, (x, residual, ln_scale, ln_bias, w1, b1, w2, b2, gamma)


def _tail_bwd(eps, saved, g):
    _, vjp = jax.vjp(
        lambda *a: _tail_reference_math(*a, eps), *saved
    )
    return vjp(g)


fused_ln_mlp_residual_trainable.defvjp(_tail_fwd, _tail_bwd)
