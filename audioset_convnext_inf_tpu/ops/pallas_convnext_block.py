"""Fully-fused ConvNeXt block kernel: dwconv7x7 + LN + MLP + residual.

One Pallas kernel per (batch, row-tile) grid cell executes the entire block
(reference convnext.py:74-87):

    HBM --one DMA (halo'd row band)--> VMEM tile (TH+6, Wp, C)
      dwconv 7x7 as 7 banded row loops x 7 lane shifts (VPU, f32 acc)
      + bias, LayerNorm (f32 stats)                    (VPU)
      reshape (TH*W, C) -> GEMM1 -> tanh GELU -> GEMM2 (MXU)
      * gamma + residual (halo-tile center slice)      (VPU)
    --> out (TH, W, C) to HBM

HBM traffic per block drops to one halo read + one write (XLA's unfused
chain re-reads/writes the activation ~12x; its depthwise lowering alone runs
at 65-99 GB/s effective). Constraints honored: the DMA'd width is padded to
a multiple of 8 sublanes (Mosaic tiling), and GELU uses the tanh form
(Mosaic has no erf) - below bf16 rounding, see ops/pallas_block.py.

Inference-only (no custom VJP); training falls back to the XLA path.

STATUS: EXPERIMENTAL, NOT the production path. Measured on v5e (B=128,
pltpu.roll-based column shifts, which compile; unaligned sublane-offset
slices hang Mosaic >10 min): SLOWER than the shipped tail-fusion +
XLA-dwconv path - 7.2 vs 5.2 ms on 31x7x768, 10.3 vs 5.5 ms on 63x14x384 -
the in-kernel VPU dwconv serializes against the MXU MLP instead of
pipelining, and C not a multiple of 128 (stage 2's 192) still fails DMA
lane-tiling alignment. Kept as a documented experiment; production uses
ops/pallas_block.py (fused LN->MLP tail).
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


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_tile_rows(h: int, w: int) -> int:
    """Rows per tile: keep ~1024 tokens per grid cell."""
    target = max(1, 1024 // max(w, 1))
    return min(h, target)


def _kernel(x_hbm, dww_ref, dwb_ref, scale_ref, bias_ref,
            w1_ref, b1_ref, w2_ref, b2_ref, gamma_ref, out_ref,
            halo_buf, sem, *, th: int, w: int, c: int, eps: float):
    b = pl.program_id(0)
    i = pl.program_id(1)

    copy_halo = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * th, th + 6)], halo_buf, sem
    )
    copy_halo.start()
    copy_halo.wait()

    # depthwise 7x7: 7 banded row loops (fori) x 7 column shifts realized as
    # pltpu.roll + aligned prefix slice. Unaligned sublane-offset slices
    # (band[:, dx:dx+w]) make Mosaic's compile time pathological; roll is a
    # native op (verified bit-exact vs lax depthwise conv).
    wp_cols = halo_buf.shape[1]

    def dy_body(dy, acc):
        row_band = halo_buf[pl.ds(dy, th)].astype(jnp.float32)  # (th, wp, c)
        for dx in range(7):
            shifted = pltpu.roll(row_band, wp_cols - dx, 1) if dx else row_band
            tap = dww_ref[pl.ds(dy * 7 + dx, 1)][0]  # (1, c)
            acc = acc + shifted[:, :w, :] * tap
        return acc

    acc = jax.lax.fori_loop(0, 7, dy_body, jnp.zeros((th, w, c), jnp.float32))
    acc = acc + dwb_ref[0]

    # LayerNorm over C (f32)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    mean_sq = jnp.mean(acc * acc, axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    xn = (acc - mean) * jax.lax.rsqrt(var + eps)
    xn = xn * scale_ref[0] + bias_ref[0]

    # MLP on the MXU over (th*w, c) tokens
    dtype = out_ref.dtype
    tok = xn.reshape(th * w, c).astype(dtype)
    dn = (((1,), (0,)), ((), ()))
    h1 = jax.lax.dot_general(tok, w1_ref[:], dn, preferred_element_type=jnp.float32)
    h1 = h1 + b1_ref[:]
    h1 = jax.nn.gelu(h1, approximate=True).astype(dtype)  # Mosaic lacks erf
    y = jax.lax.dot_general(h1, w2_ref[:], dn, preferred_element_type=jnp.float32)
    y = (y + b2_ref[:]) * gamma_ref[:]

    # residual = center of the halo tile (rows 3:3+th, cols 3:3+w)
    res = halo_buf[3 : 3 + th, 3 : 3 + w, :].astype(jnp.float32).reshape(th * w, c)
    out_ref[0] = (res + y).reshape(th, w, c).astype(dtype)


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def fused_convnext_block(
    x: Array,  # (B, H, W, C) block input (= residual)
    dw_w: Array,  # (7, 7, 1, C) HWIO depthwise weights
    dw_b: Array,
    ln_scale: Array,
    ln_bias: Array,
    w1: Array,
    b1: Array,
    w2: Array,
    b2: Array,
    gamma: Optional[Array],
    eps: float = 1e-6,
) -> Array:
    bsz, h, w, c = x.shape
    hidden = w1.shape[-1]
    th = _pick_tile_rows(h, w)
    h_pad = _round_up(h, th)
    wp = _round_up(w + 6, 8)  # DMA'd width: 8-sublane aligned (Mosaic tiling)
    dtype = x.dtype

    # rows: +3 halo top, +3 halo + tile slack bottom; cols: +3 left, pad right
    xp = jnp.pad(x, ((0, 0), (3, 3 + (h_pad - h)), (3, wp - w - 3), (0, 0)))

    g = gamma if gamma is not None else jnp.ones((c,), jnp.float32)
    dww = jnp.asarray(dw_w, jnp.float32).reshape(49, 1, c)

    grid = (bsz, h_pad // th)
    out = pl.pallas_call(
        functools.partial(_kernel, th=th, w=w, c=c, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x padded, manual halo DMA
            pl.BlockSpec((49, 1, c), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hidden), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, c), lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h_pad, w, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 6, wp, c), dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h_pad * w * (49 * c + 2 * c * hidden),
            bytes_accessed=2 * bsz * h_pad * w * c * x.dtype.itemsize,
            transcendentals=bsz * h_pad * w * hidden,
        ),
        interpret=_use_interpret(),
    )(
        xp,
        dww,
        jnp.asarray(dw_b, jnp.float32)[None, :],
        jnp.asarray(ln_scale, jnp.float32)[None, :],
        jnp.asarray(ln_bias, jnp.float32)[None, :],
        w1.astype(dtype),
        jnp.asarray(b1, jnp.float32)[None, :],
        w2.astype(dtype),
        jnp.asarray(b2, jnp.float32)[None, :],
        jnp.asarray(g, jnp.float32)[None, :],
    )
    return out[:, :h]
