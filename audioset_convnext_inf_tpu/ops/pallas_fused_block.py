"""Fully-fused ConvNeXt block kernel: dwconv stencil overlapped with the MLP.

Rebuilds the whole reference block (pytorch/convnext.py:58-87) - depthwise
7x7 conv, LayerNorm, pwconv1, GELU, pwconv2, layer-scale, residual - as ONE
software-pipelined Pallas kernel:

    step (bg, i):   VPU: 7x7 stencil of h-tile i        -> sbuf[i % 2]
                    MXU: LN+MLP+residual of h-tile i-1  <- sbuf[(i-1) % 2]

The two halves touch disjoint buffers, so Mosaic's scheduler overlaps the
stencil's vector FMAs with the MLP's matmuls - measured on v5e, independent
VPU and MXU streams in one kernel run at ~max(t_vpu, t_mxu) instead of the
sum (NOTES.md). This hides the depthwise-conv time, which is VPU-roofline
bound (~49 MACs/elem at ~1 vector op/cycle) and cannot be made fast on its
own (round-1 negative results; XLA's lowering is already near that roofline).

Layout: activations are (H, W, B, C) ("HWBC") with C padded to a multiple of
128. Both convolved axes (H, W) are major dims, so every stencil tap is a
pure address offset - no sublane/lane relayouts (the failure mode of NHWC
Pallas stencils: unaligned sublane slices hang Mosaic, pltpu.roll is 4x
slower than XLA). Batch fills the sublane dim (16 per group), channels the
lanes. Channel padding is zero and every op here preserves it (LN divides by
the REAL C; pad lanes of all weights/biases are zero), so padded lanes stay
exactly 0 through arbitrarily many chained blocks.

The 7-row halo is fetched by a manual triple-buffered HBM->VMEM DMA ring
(input stays in ANY/HBM); the residual for tile i-1 is read from the ring
slot that still holds tile i-1's input rows (mod-3 ring: the prefetch target
(i+1) % 3 never collides with the residual slot (i-1) % 3).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

K = 7  # dwconv kernel size
P = 3  # dwconv padding
SUB = 16  # batch per group = bf16 sublane tile


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _kernel(x_any, dww_ref, dwb_ref, lns_ref, lnb_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, g_ref, *refs,
            HT, W, WCH, Cp, C, n_h, eps, mrows, streams="both",
            padless=False, HT_LAST=None, save_d=False):
    if save_d:  # training: extra per-sample drop-path scale input + d output
        s_ref, out_ref, dout_ref, xin, sbuf, sem = refs
    else:
        (out_ref, xin, sbuf, sem), s_ref, dout_ref = refs, None, None
    if HT_LAST is None:
        HT_LAST = HT
    bg = pl.program_id(0)
    i = pl.program_id(1)
    n_bg = pl.num_programs(0)

    # Global tile counter: tile (bg, i) has index t = bg*n_h + i. The DMA
    # ring is indexed by t mod 3, so within any step the stencil source
    # (t%3), the tail's residual ((t-1)%3) and the prefetch target ((t+1)%3)
    # are provably distinct - including across batch-group boundaries.
    t = bg * n_h + i

    if padless:
        # The input array carries NO halo margins (the per-block jnp.pad
        # cost a full-array copy). Requires HT >= P, n_h >= 2 and a last
        # tile of HT_LAST = H - (n_h-1)*HT >= P rows (HT_LAST == HT when
        # HT | H): the three tile classes then all have STATIC DMA shapes -
        # first tile fetches rows [0, HT+P) into scratch offset P, last
        # fetches [h0-P, H) (= HT_LAST+P rows) into offset 0, interior
        # fetches [h0-P, h0+HT+P) into offset 0 - and the scratch rows/cols
        # not covered (H-boundary halo, W margins) are zeroed in-kernel.
        # Center rows land at scratch offset P in all three classes, so
        # stencil/residual indexing is unchanged. When HT_LAST < HT the last
        # tile's trailing stencil/tail rows consume zeroed scratch and land
        # in output rows >= H, which the caller slices off.
        def _for_each_class(tile, slot, op):
            """Build the tile class's copy inside its own predicated region
            (constructing unused descriptors logs spurious warnings)."""
            b = tile // n_h
            h = tile - b * n_h
            dst = xin.at[slot]

            @pl.when(h == 0)
            def _():
                op(pltpu.make_async_copy(
                    x_any.at[pl.ds(0, HT + P), :, b],
                    dst.at[pl.ds(P, HT + P), pl.ds(P, W)], sem.at[slot]))

            @pl.when(h == n_h - 1)
            def _():
                op(pltpu.make_async_copy(
                    x_any.at[pl.ds(h * HT - P, HT_LAST + P), :, b],
                    dst.at[pl.ds(0, HT_LAST + P), pl.ds(P, W)], sem.at[slot]))

            # interior class exists only at n_h >= 3; at n_h == 2 its
            # (HT+2P)-row descriptor can exceed H statically (trace-time
            # shape error) even though the predicate is never true
            if n_h >= 3:
                @pl.when(jnp.logical_and(h > 0, h < n_h - 1))
                def _():
                    op(pltpu.make_async_copy(
                        x_any.at[pl.ds(h * HT - P, HT + 2 * P), :, b],
                        dst.at[pl.ds(0, HT + 2 * P), pl.ds(P, W)], sem.at[slot]))
            return tile - (tile // n_h) * n_h

        def dma_start(tile, slot):
            _for_each_class(tile, slot, lambda c: c.start())

        def dma_wait(tile, slot):
            h = _for_each_class(tile, slot, lambda c: c.wait())

            # zero the rows the boundary DMAs do not cover
            @pl.when(h == 0)
            def _():
                xin[slot, 0:P] = jnp.zeros_like(xin[slot, 0:P])

            @pl.when(h == n_h - 1)
            def _():
                xin[slot, HT_LAST + P:] = jnp.zeros_like(xin[slot, HT_LAST + P:])

            # W margins: zeroed once per ring slot (slots are first used at
            # global steps 0, 1, 2 and the margins are never re-written)
            @pl.when(t < 3)
            def _():
                xin[slot, :, 0:P] = jnp.zeros_like(xin[slot, :, 0:P])
                xin[slot, :, P + W:] = jnp.zeros_like(xin[slot, :, P + W:])
    else:
        def _padded_dma(tile, slot):
            b = tile // n_h
            h = tile - b * n_h
            return pltpu.make_async_copy(
                x_any.at[pl.ds(h * HT, HT + 2 * P), :, b], xin.at[slot],
                sem.at[slot])

        def dma_start(tile, slot):
            _padded_dma(tile, slot).start()

        def dma_wait(tile, slot):
            _padded_dma(tile, slot).wait()

    # Warm-up fetch for the very first tile; later tiles are prefetched one
    # step ahead (including across batch-group boundaries: tile (bg+1, 0) is
    # started at step (bg, n_h - 1) and waited two steps later).
    @pl.when(jnp.logical_and(bg == 0, i == 0))
    def _():
        dma_start(0, 0)

    @pl.when(i < n_h)
    def _():
        dma_wait(t, t % 3)

    @pl.when(jnp.logical_and(i < n_h, t + 1 < n_bg * n_h))
    def _():
        dma_start(t + 1, (t + 1) % 3)

    # ---------------- VPU stream: 7x7 depthwise stencil of tile i ----------
    # Register-window formulation: per (h, w-chunk, dy) load the (n+6)-wide
    # input window ONCE, convert once, then take the 7 dx taps as value-level
    # slices of that window (register selection, no reloads). ~2 vector ops
    # per MAC instead of the naive 3.5 (load+convert+weight-load per tap).
    # Channels are processed in 128-lane chunks to bound register pressure.
    def _stencil():
        src = xin.at[t % 3]
        CB = Cp // 128

        for h in range(HT):
            for cb in range(CB):
                cs = slice(cb * 128, (cb + 1) * 128)
                bias = dwb_ref[:, cs]  # (SUB, 128) f32
                for wc in range(0, W, WCH):
                    n = min(WCH, W - wc)
                    acc = jnp.zeros((n, SUB, 128), jnp.float32) + bias
                    for dy in range(K):
                        win = src[h + dy, wc:wc + n + 2 * P, :, cs].astype(jnp.float32)
                        for dx in range(K):
                            acc = acc + win[dx:dx + n] * dww_ref[dy * K + dx, :, cs]
                    sbuf[i % 2, h, wc:wc + n, :, cs] = acc.astype(sbuf.dtype)

    # ---------------- MXU stream: LN + MLP + residual of tile i-1 ----------
    def _tail():
        j = i - 1
        sb = sbuf.at[j % 2]
        res = xin.at[(t - 1) % 3]

        for mc in range(HT // mrows):
            h0 = mc * mrows
            xs = sb[pl.ds(h0, mrows)].reshape(mrows * W * SUB, Cp)
            if save_d:  # stash the dwconv output for the fused-VJP backward
                dout_ref[pl.ds(h0, mrows)] = xs.reshape(mrows, W, 1, SUB, Cp)
            rs = res[pl.ds(P + h0, mrows), P:P + W].reshape(mrows * W * SUB, Cp)

            xf = xs.astype(jnp.float32)
            mean = jnp.sum(xf, axis=-1, keepdims=True) * (1.0 / C)
            mean_sq = jnp.sum(xf * xf, axis=-1, keepdims=True) * (1.0 / C)
            var = jnp.maximum(mean_sq - mean * mean, 0.0)
            xn = (xf - mean) * jax.lax.rsqrt(var + eps)
            xn = (xn * lns_ref[:] + lnb_ref[:]).astype(xs.dtype)

            h1 = jax.lax.dot_general(
                xn, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b1_ref[:]
            h1 = jax.nn.gelu(h1, approximate=True).astype(xs.dtype)
            y = jax.lax.dot_general(
                h1, w2_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b2_ref[:]
            y = y * g_ref[:]
            if save_d:  # per-sample drop-path scale on the branch only
                y = (y.reshape(mrows, W, SUB, Cp)
                     * s_ref[0]).reshape(mrows * W * SUB, Cp)
            out = (rs.astype(jnp.float32) + y).astype(out_ref.dtype)
            out_ref[pl.ds(h0, mrows)] = out.reshape(mrows, W, 1, SUB, Cp)

    # Region structure matters: Mosaic schedules instructions within one
    # predicated region but not across regions, so the steady-state step
    # (stencil AND tail active) must be ONE region for the VPU stencil to
    # overlap the MXU matmuls. Boundary steps get their own regions.
    if streams == "stencil":
        pl.when(i < n_h)(_stencil)
    elif streams == "tail":
        pl.when(i > 0)(_tail)
    else:
        @pl.when(jnp.logical_and(i > 0, i < n_h))
        def _steady():
            _stencil()
            _tail()

        @pl.when(i == 0)
        def _first():
            _stencil()

        @pl.when(i == n_h)
        def _last():
            _tail()


def fused_block_hwbc(
    x: Array,  # (H, W, B, Cp) channel-padded, HWBC layout
    dw_w: Array,  # (K, K, C) depthwise weights (unpadded)
    dw_b: Array,  # (C,)
    ln_scale: Array,  # (C,)
    ln_bias: Array,  # (C,)
    w1: Array,  # (C, 4C)
    b1: Array,  # (4C,)
    w2: Array,  # (4C, C)
    b2: Array,  # (C,)
    gamma: Optional[Array],  # (C,) or None
    eps: float = 1e-6,
    ht: int = 2,
    mrows: Optional[int] = None,
    wch: int = 4,
    streams: str = "both",
    save_dwconv: bool = False,
    s: Optional[Array] = None,  # (B,) per-sample drop-path scale (train only)
) -> Array:
    """One ConvNeXt block in HWBC layout. Returns (H, W, B, Cp).

    ``ht``: h-rows per pipeline tile. ``mrows``: h-rows per MLP GEMM chunk
    (bounds the f32 accumulator VMEM); must divide ht.
    ``save_dwconv``: also return the dwconv output (same shape) for the
    fused-VJP training backward, which recomputes LN/GELU from it.
    """
    H, W, B, Cp = x.shape
    C = dw_w.shape[-1]
    assert Cp % 128 == 0 and Cp >= C, (Cp, C)
    assert B % SUB == 0, B
    BG = B // SUB
    hidden = w1.shape[-1]
    pc = Cp - C

    n_h = -(-H // ht)
    Hp = n_h * ht
    Wp = W + 2 * P
    if mrows is None:
        mrows = ht
        while mrows * W * SUB > 1024 and mrows % 2 == 0:
            mrows //= 2
    assert ht % mrows == 0, (ht, mrows)

    dt = x.dtype
    # With >= 2 tiles and a last tile of >= P rows, the kernel fetches halos
    # with boundary-aware DMAs and zeroes the margins itself, so the input
    # needs NO jnp.pad - which would copy the whole array per block
    # (~2.8 ms/model at B=128). A ragged last tile (H % ht != 0) is fine:
    # its DMA class has its own static shape and the trailing output rows
    # (>= H) are computed from zeroed scratch and sliced off below.
    # ht >= P keeps every interior tile's halo inside its neighbors' rows;
    # ht_last >= P keeps the second-to-last tile's lower halo inside H.
    ht_last = H - (n_h - 1) * ht
    padless = n_h >= 2 and ht >= P and ht_last >= P
    if padless:
        xp = x.reshape(H, W, BG, SUB, Cp)  # pure view
    else:
        xp = jnp.pad(x, ((P, P + Hp - H), (P, P), (0, 0), (0, 0)))
        xp = xp.reshape(Hp + 2 * P, Wp, BG, SUB, Cp)

    def padc(a):
        return jnp.pad(jnp.asarray(a, jnp.float32), ((0, pc),))

    dwwf = jnp.pad(jnp.asarray(dw_w, jnp.float32).reshape(K * K, 1, C),
                   ((0, 0), (0, 0), (0, pc)))
    dwwf = jnp.broadcast_to(dwwf, (K * K, SUB, Cp))
    dwbf = jnp.broadcast_to(padc(dw_b)[None, :], (SUB, Cp))
    g = gamma if gamma is not None else jnp.ones((C,), jnp.float32)

    w1p = jnp.pad(w1.astype(dt), ((0, pc), (0, 0)))
    w2p = jnp.pad(w2.astype(dt), ((0, 0), (0, pc)))

    out_spec = pl.BlockSpec(
        (ht, W, 1, SUB, Cp),
        lambda b, i: (jnp.maximum(i - 1, 0), 0, b, 0, 0),
        memory_space=pltpu.VMEM)
    out_sds = jax.ShapeDtypeStruct((Hp, W, BG, SUB, Cp), dt)
    out = pl.pallas_call(
        functools.partial(_kernel, HT=ht, W=W, WCH=wch, Cp=Cp, C=C, n_h=n_h,
                          eps=eps, mrows=mrows, streams=streams,
                          padless=padless, HT_LAST=ht_last if padless else ht,
                          save_d=save_dwconv),
        grid=(BG, n_h + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((K * K, SUB, Cp), lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB, Cp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, hidden), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, Cp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cp), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec((1, SUB, Cp), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)] if save_dwconv else []),
        out_specs=[out_spec, out_spec] if save_dwconv else out_spec,
        out_shape=[out_sds, out_sds] if save_dwconv else out_sds,
        scratch_shapes=[
            pltpu.VMEM((3, ht + 2 * P, Wp, SUB, Cp), dt),
            pltpu.VMEM((2, ht, W, SUB, Cp), dt),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Hp * W * B * (Cp * K * K + 2 * Cp * hidden),
            bytes_accessed=3 * Hp * W * B * Cp * 2,
            transcendentals=Hp * W * B * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(
        xp, dwwf, dwbf,
        padc(ln_scale)[None, :], padc(ln_bias)[None, :],
        w1p, jnp.asarray(b1, jnp.float32)[None, :],
        w2p, padc(b2)[None, :],
        padc(g)[None, :],
        *([jnp.broadcast_to(
            jnp.asarray(s if s is not None else jnp.ones((B,)),
                        jnp.float32).reshape(BG, SUB, 1),
            (BG, SUB, Cp))] if save_dwconv else []),
    )
    if save_dwconv:
        y, d = out
        return (y.reshape(Hp, W, B, Cp)[:H], d.reshape(Hp, W, B, Cp)[:H])
    return out.reshape(Hp, W, B, Cp)[:H]
