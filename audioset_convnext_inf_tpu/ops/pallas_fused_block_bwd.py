"""Fully-fused ConvNeXt block BACKWARD kernel: dgrad/wgrad stencils overlapped
with the MLP gradient GEMMs.

Training counterpart of ``pallas_fused_block.py`` (the reference block is
pytorch/convnext.py:58-87; the reference has no fused backward - torch runs
each gradient op separately). XLA's backward for one block issues ~5 GEMMs
(h1 recompute, gT*dz2, dz2@W2^T, xn^T*dh1, dh1@W1^T) and ~2 full 7x7
depthwise stencil passes (dgrad + wgrad) strictly one after another; the MXU
idles during the VPU stencils and vice versa. This kernel software-pipelines
them in ONE Pallas program:

    step (bg, i):  chain(i):    recompute LN/h1/gelu, run the 5 GEMMs (MXU)
                                and the LN/GELU backward (VPU), emit
                                delta_d(i) into a 3-slot VMEM ring
                   wgrad(i):    49-tap reduce of x halo x delta_d(i)   (VPU)
                   dgrad(i-1):  49-tap flipped-kernel stencil over the
                                delta_d ring -> dx tile i-1             (VPU)

Mosaic schedules all three inside one predicated region, so the stencil
vector FMAs overlap the chain's matmuls (NOTES.md: MXU+VPU overlap works
within one region). Weight-gradient accumulators (dW1, M = g^T dys, the
49-tap dw accumulator, bias/LN vectors) live in VMEM-resident output blocks
with constant index maps, zeroed at the first grid step; dW2/db2/dgamma are
derived from M outside the kernel (dW2 = gamma * M; dgamma needs only
sum_k W2 .* M and sum dys, so no sixth GEMM is needed).

Layout matches the forward kernel: (H, W, B, C) with C padded to 128 lanes,
batch in 16-row sublane groups. Saved-from-forward inputs: the block input
``x`` (residual + wgrad window source) and the dwconv output ``d``
(LN statistics and the GELU hidden are recomputed from it - storing the
(.., 4C) hidden is impossible at flagship sizes, NOTES.md). Halos are
fetched with the forward kernel's boundary-aware padless DMA classes
(requires ht >= 3, ht_last >= 3, n_h >= 2; the wrapper falls back to an XLA
backward otherwise). delta_d halo rows across tile boundaries come from the
VMEM ring with per-edge value-level zero gating, so delta_d never
round-trips HBM.

Drop-path enters as a per-sample scale s (B,) folded into dys = dy * s; the
kernel is exact for the reference semantics y = x + s * gamma * block(x).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

K = 7
P = 3
SUB = 16

_C0 = 0.7978845608028654  # sqrt(2/pi)
_C1 = 0.044715


def _use_interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _bwd_kernel(x_any, d_any, dy_any, wflip_ref, lns_ref, lnb_ref, w1_ref,
                b1_ref, w2_ref, g_ref, s_ref,
                dx_ref, macc_ref, dw1_ref, dwacc_ref, vec_ref, db1_ref,
                xin, dyin, din, dd, sem_x, sem_dy, sem_d,
                *, HT, HT_LAST, W, Cp, C, hidden, n_h, eps, mrows):
    bg = pl.program_id(0)
    i = pl.program_id(1)
    n_bg = pl.num_programs(0)
    t = bg * n_h + i
    Wp = W + 2 * P

    # ---------------- DMA plumbing (forward kernel's padless classes) -------
    def _x_classes(tile, slot, op):
        b = tile // n_h
        h = tile - b * n_h
        dst = xin.at[slot]

        @pl.when(h == 0)
        def _():
            op(pltpu.make_async_copy(
                x_any.at[pl.ds(0, HT + P), :, b],
                dst.at[pl.ds(P, HT + P), pl.ds(P, W)], sem_x.at[slot]))

        @pl.when(h == n_h - 1)
        def _():
            op(pltpu.make_async_copy(
                x_any.at[pl.ds(h * HT - P, HT_LAST + P), :, b],
                dst.at[pl.ds(0, HT_LAST + P), pl.ds(P, W)], sem_x.at[slot]))

        if n_h > 2:  # static: no interior tiles exist at n_h == 2, and the
            # descriptor's HT+2P row size may exceed H there
            @pl.when(jnp.logical_and(h > 0, h < n_h - 1))
            def _():
                op(pltpu.make_async_copy(
                    x_any.at[pl.ds(h * HT - P, HT + 2 * P), :, b],
                    dst.at[pl.ds(0, HT + 2 * P), pl.ds(P, W)], sem_x.at[slot]))
        return h

    def _flat_classes(src_any, scratch, sem, tile, slot, op):
        """dy/d tiles carry no halo; full tiles vs the ragged last tile."""
        b = tile // n_h
        h = tile - b * n_h
        dst = scratch.at[slot]

        @pl.when(h < n_h - 1)
        def _():
            op(pltpu.make_async_copy(
                src_any.at[pl.ds(h * HT, HT), :, b],
                dst.at[pl.ds(0, HT)], sem.at[slot]))

        @pl.when(h == n_h - 1)
        def _():
            op(pltpu.make_async_copy(
                src_any.at[pl.ds(h * HT, HT_LAST), :, b],
                dst.at[pl.ds(0, HT_LAST)], sem.at[slot]))
        return h

    def dma_start(tile, slot):
        _x_classes(tile, slot, lambda c: c.start())
        _flat_classes(dy_any, dyin, sem_dy, tile, slot, lambda c: c.start())
        # the d ring is mod-2 and must be indexed by the TILE number, not by
        # the mod-3 x-ring slot ((t % 3) % 2 != t % 2 from t = 3 on)
        _flat_classes(d_any, din, sem_d, tile, tile % 2, lambda c: c.start())

    def dma_wait(tile, slot):
        h = _x_classes(tile, slot, lambda c: c.wait())
        _flat_classes(dy_any, dyin, sem_dy, tile, slot, lambda c: c.wait())
        _flat_classes(d_any, din, sem_d, tile, tile % 2, lambda c: c.wait())

        # zero the x rows the boundary DMAs do not cover
        @pl.when(h == 0)
        def _():
            xin[slot, 0:P] = jnp.zeros_like(xin[slot, 0:P])

        @pl.when(h == n_h - 1)
        def _():
            xin[slot, HT_LAST + P:] = jnp.zeros_like(xin[slot, HT_LAST + P:])

        # ragged last tile: stale dy rows would pollute the accumulators,
        # and stale d rows can be NaN/Inf garbage whose zero-dy products
        # still poison the GEMM accumulations (NaN * 0 = NaN)
        if HT_LAST < HT:
            @pl.when(h == n_h - 1)
            def _():
                dyin[slot, HT_LAST:] = jnp.zeros_like(dyin[slot, HT_LAST:])
                din[tile % 2, HT_LAST:] = jnp.zeros_like(din[tile % 2, HT_LAST:])

        # x W margins: zeroed once per ring slot
        @pl.when(t < 3)
        def _():
            xin[slot, :, 0:P] = jnp.zeros_like(xin[slot, :, 0:P])
            xin[slot, :, P + W:] = jnp.zeros_like(xin[slot, :, P + W:])
            dd[slot, :, 0:P] = jnp.zeros_like(dd[slot, :, 0:P])
            dd[slot, :, P + W:] = jnp.zeros_like(dd[slot, :, P + W:])

    @pl.when(jnp.logical_and(bg == 0, i == 0))
    def _():
        dma_start(0, 0)
        # zero the VMEM-resident accumulator outputs once
        macc_ref[...] = jnp.zeros_like(macc_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dwacc_ref[...] = jnp.zeros_like(dwacc_ref)
        vec_ref[...] = jnp.zeros_like(vec_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    @pl.when(i < n_h)
    def _():
        dma_wait(t, t % 3)

    @pl.when(jnp.logical_and(i < n_h, t + 1 < n_bg * n_h))
    def _():
        dma_start(t + 1, (t + 1) % 3)

    # ---------------- chain(i): GEMM-grad chain, emits delta_d --------------
    def _chain():
        sx = s_ref[0].astype(jnp.float32)  # (SUB, Cp) per-sample scale
        gam = g_ref[:].astype(jnp.float32)  # (1, Cp)
        lns = lns_ref[:].astype(jnp.float32)
        lnb = lnb_ref[:].astype(jnp.float32)
        dslot = din.at[t % 2]
        dyslot = dyin.at[t % 3]

        for mc in range(HT // mrows):
            rows = pl.ds(mc * mrows, mrows)
            n_m = mrows * W * SUB
            dcur = dslot[rows].reshape(n_m, Cp).astype(jnp.float32)
            # LN recompute (f32 statistics over the REAL C lanes)
            mean = jnp.sum(dcur, axis=-1, keepdims=True) * (1.0 / C)
            msq = jnp.sum(dcur * dcur, axis=-1, keepdims=True) * (1.0 / C)
            var = jnp.maximum(msq - mean * mean, 0.0)
            rstd = jax.lax.rsqrt(var + eps)
            xhat = (dcur - mean) * rstd
            xn32 = xhat * lns + lnb
            xn = xn32.astype(dx_ref.dtype)
            h1 = jax.lax.dot_general(
                xn, w1_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + b1_ref[:]
            inner = _C0 * (h1 + _C1 * h1 * h1 * h1)
            th = jnp.tanh(inner)
            gact = (0.5 * h1 * (1.0 + th)).astype(dx_ref.dtype)

            dyc = dyslot[rows].astype(jnp.float32) * sx  # (mrows, W, SUB, Cp)
            dys32 = dyc.reshape(n_m, Cp)
            dys = dys32.astype(dx_ref.dtype)
            macc_ref[...] += jax.lax.dot_general(
                gact, dys, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dz2 = (dys32 * gam).astype(dx_ref.dtype)
            dg = jax.lax.dot_general(
                dz2, w2_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            gp = (0.5 * (1.0 + th)
                  + 0.5 * h1 * (1.0 - th * th) * _C0 * (1.0 + 3.0 * _C1 * h1 * h1))
            dh1f = dg * gp
            db1_ref[...] += jnp.sum(dh1f, axis=0, keepdims=True)
            dh1 = dh1f.astype(dx_ref.dtype)
            dw1_ref[...] += jax.lax.dot_general(
                xn, dh1, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dxn = jax.lax.dot_general(
                dh1, w1_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            vec_ref[0:1] += jnp.sum(dxn, axis=0, keepdims=True)
            vec_ref[1:2] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
            vec_ref[2:3] += jnp.sum(dys32, axis=0, keepdims=True)
            dxh = dxn * lns
            m1 = jnp.sum(dxh, axis=-1, keepdims=True) * (1.0 / C)
            m2 = jnp.sum(dxh * xhat, axis=-1, keepdims=True) * (1.0 / C)
            ddc = rstd * (dxh - m1 - xhat * m2)
            vec_ref[3:4] += jnp.sum(ddc, axis=0, keepdims=True)
            dd[t % 3, rows, P:P + W] = (
                ddc.reshape(mrows, W, SUB, Cp).astype(dd.dtype))

    # ---------------- wgrad(i): dw[tap] += x_window * delta_d(i) ------------
    def _wgrad():
        xslot = xin.at[t % 3]
        ddslot = dd.at[t % 3]
        CB = Cp // 128
        for h in range(HT):
            for cb in range(CB):
                cs = slice(cb * 128, (cb + 1) * 128)
                ddf = ddslot[h, P:P + W, :, cs].astype(jnp.float32)
                for dyk in range(K):
                    xf = xslot[h + dyk, :, :, cs].astype(jnp.float32)
                    for dxk in range(K):
                        dwacc_ref[dyk * K + dxk, :, :, cs] += (
                            xf[dxk:dxk + W] * ddf)

    # ---------------- dgrad(i-1): flipped stencil over the delta_d ring -----
    def _dgrad():
        jj = i - 1
        top_ok = jj > 0
        bot_ok = jj < n_h - 1
        prev = dd.at[(t - 2) % 3]
        cur = dd.at[(t - 1) % 3]
        nxt = dd.at[t % 3]
        dyprev = dyin.at[(t - 1) % 3]
        CB = Cp // 128
        for h in range(HT):
            for cb in range(CB):
                cs = slice(cb * 128, (cb + 1) * 128)
                # residual shortcut: dx = dy + flipped-stencil(delta_d)
                acc = dyprev[h, :, :, cs].astype(jnp.float32)
                for dyk in range(K):
                    r = h + dyk - P
                    if r < 0:
                        row = prev[HT + r, :, :, cs].astype(jnp.float32)
                        row = jnp.where(top_ok, row, 0.0)
                    elif r < HT:
                        row = cur[r, :, :, cs].astype(jnp.float32)
                    else:
                        row = nxt[r - HT, :, :, cs].astype(jnp.float32)
                        row = jnp.where(bot_ok, row, 0.0)
                    for dxk in range(K):
                        acc = acc + row[dxk:dxk + W] * wflip_ref[dyk * K + dxk, :, cs]
                dx_ref[h, :, 0, :, cs] = acc.astype(dx_ref.dtype)

    @pl.when(jnp.logical_and(i > 0, i < n_h))
    def _steady():
        _chain()
        _wgrad()
        _dgrad()

    @pl.when(i == 0)
    def _first():
        _chain()
        _wgrad()

    @pl.when(i == n_h)
    def _last():
        _dgrad()


def fused_block_bwd_hwbc(
    x: Array,      # (H, W, B, Cp) saved block input
    d: Array,      # (H, W, B, Cp) saved dwconv output (incl. bias)
    dy: Array,     # (H, W, B, Cp) upstream cotangent
    dw_w: Array,   # (K, K, C)
    ln_scale: Array, ln_bias: Array,       # (C,)
    w1: Array, b1: Array,                  # (C, 4C), (4C,)
    w2: Array, b2: Array,                  # (4C, C), (C,)
    gamma: Optional[Array],                # (C,) or None
    s: Array,                              # (B,) drop-path scale (ones at eval)
    eps: float = 1e-6,
    ht: int = 3,
    mrows: int = 1,
) -> Tuple[Array, dict]:
    """Returns (dx, grads) for y = x + s*gamma*(MLP(LN(dwconv(x)))).

    grads keys mirror the block param pytree: dwconv.w/.b, norm.scale/.bias,
    pwconv1.w/.b, pwconv2.w/.b, gamma (all f32, unpadded).
    """
    H, W, B, Cp = x.shape
    C = dw_w.shape[-1]
    hidden = w1.shape[-1]
    assert Cp % 128 == 0 and B % SUB == 0 and hidden % 128 == 0
    BG = B // SUB
    pc = Cp - C

    n_h = -(-H // ht)
    ht_last = H - (n_h - 1) * ht
    assert n_h >= 2 and ht >= P and ht_last >= P, (
        f"unsupported geometry H={H} ht={ht}: need n_h>=2, ht>=3, ht_last>=3")
    assert ht % mrows == 0

    dt = x.dtype
    Wp = W + 2 * P

    def padc(a):
        return jnp.pad(jnp.asarray(a, jnp.float32), ((0, pc),))

    # flipped dwconv weights for the dgrad correlation
    wf = jnp.asarray(dw_w, jnp.float32)[::-1, ::-1, :].reshape(K * K, 1, C)
    wf = jnp.broadcast_to(jnp.pad(wf, ((0, 0), (0, 0), (0, pc))), (K * K, SUB, Cp))
    g = gamma if gamma is not None else jnp.ones((C,), jnp.float32)
    sb = jnp.broadcast_to(
        jnp.asarray(s, jnp.float32).reshape(BG, SUB, 1), (BG, SUB, Cp))

    w1p = jnp.pad(w1.astype(dt), ((0, pc), (0, 0)))
    w2p = jnp.pad(w2.astype(dt), ((0, 0), (0, pc)))

    xr = x.reshape(H, W, BG, SUB, Cp)
    dr = d.reshape(H, W, BG, SUB, Cp)
    dyr = dy.reshape(H, W, BG, SUB, Cp)

    Hp = n_h * ht
    kernel = functools.partial(
        _bwd_kernel, HT=ht, HT_LAST=ht_last, W=W, Cp=Cp, C=C, hidden=hidden,
        n_h=n_h, eps=eps, mrows=mrows)

    vspec = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(BG, n_h + 1),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            vspec((K * K, SUB, Cp)),
            vspec((1, Cp)), vspec((1, Cp)),
            vspec((Cp, hidden)), vspec((1, hidden)),
            vspec((hidden, Cp)), vspec((1, Cp)),
            pl.BlockSpec((1, SUB, Cp), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ht, W, 1, SUB, Cp),
                         lambda b, i: (jnp.maximum(i - 1, 0), 0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec((hidden, Cp)),
            vspec((Cp, hidden)),
            vspec((K * K, W, SUB, Cp)),
            vspec((4, Cp)),
            vspec((1, hidden)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, W, BG, SUB, Cp), dt),
            jax.ShapeDtypeStruct((hidden, Cp), jnp.float32),
            jax.ShapeDtypeStruct((Cp, hidden), jnp.float32),
            jax.ShapeDtypeStruct((K * K, W, SUB, Cp), jnp.float32),
            jax.ShapeDtypeStruct((4, Cp), jnp.float32),
            jax.ShapeDtypeStruct((1, hidden), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((3, ht + 2 * P, Wp, SUB, Cp), dt),
            pltpu.VMEM((3, ht, W, SUB, Cp), dt),
            pltpu.VMEM((2, ht, W, SUB, Cp), dt),
            pltpu.VMEM((3, ht, Wp, SUB, Cp), dt),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * Hp * W * B * (2 * Cp * K * K + 5 * Cp * hidden),
            bytes_accessed=5 * Hp * W * B * Cp * 2,
            transcendentals=2 * Hp * W * B * hidden,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_use_interpret(),
    )(
        xr, dr, dyr, wf,
        padc(ln_scale)[None, :], padc(ln_bias)[None, :],
        w1p, jnp.asarray(b1, jnp.float32)[None, :],
        w2p, padc(g)[None, :], sb,
    )
    dx_p, macc, dw1, dwacc, vec, db1 = out

    dx = dx_p.reshape(Hp, W, B, Cp)[:H]
    w2f = w2p.astype(jnp.float32)
    dlnb, dlns, sdys, dbdw = vec[0], vec[1], vec[2], vec[3]
    grads = {
        "dwconv": {
            "w": jnp.sum(dwacc, axis=(1, 2))[:, :C].reshape(K, K, 1, C),
            "b": dbdw[:C],
        },
        "norm": {"scale": dlns[:C], "bias": dlnb[:C]},
        "pwconv1": {"w": dw1[:C], "b": db1[0]},
        "pwconv2": {
            "w": macc[:, :C] * jnp.asarray(g, jnp.float32)[None, :],
            "b": jnp.asarray(g, jnp.float32) * sdys[:C],
        },
    }
    if gamma is not None:
        grads["gamma"] = (
            jnp.sum(w2f * macc, axis=0)[:C]
            + jnp.asarray(b2, jnp.float32) * sdys[:C])
    return dx, grads
