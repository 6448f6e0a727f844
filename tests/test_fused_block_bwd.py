"""Fused block-backward kernel vs jax.grad of the XLA block.

The backward kernel (ops/pallas_fused_block_bwd.py) recomputes LN/GELU from
the saved dwconv output and emits every gradient of the reference block
semantics y = x + s*gamma*MLP(LN(dwconv(x))) (pytorch/convnext.py:58-87,
tanh GELU). Ground truth here is jax.grad of an independently-written XLA
forward over the same math - covering the LN backward, the tanh-GELU
derivative, both weight-grad GEMM accumulations across tiles and batch
groups, the flipped-kernel dgrad stencil (incl. tile-boundary halos from the
VMEM ring), the 49-tap wgrad reduction, drop-path scaling, ragged last
tiles, and zero-padded channel lanes.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.ops.pallas_fused_block_bwd import fused_block_bwd_hwbc

SUB = 16


def _ref_forward(x, p, s, eps=1e-6):
    """Independent XLA forward in HWBC with real (unpadded) channels."""
    H, W, B, C = x.shape
    xb = jnp.transpose(x, (2, 0, 1, 3))  # BHWC
    d = jax.lax.conv_general_dilated(
        xb, p["dww"], (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C) + p["dwb"]
    xf = d.astype(jnp.float32)
    mean = jnp.mean(xf, -1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - mean * mean, 0.0)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps) * p["lns"] + p["lnb"]
    h1 = xn @ p["w1"] + p["b1"]
    g = jax.nn.gelu(h1, approximate=True)
    z2 = g @ p["w2"] + p["b2"]
    y = xb + s[:, None, None, None] * p["gamma"] * z2
    return jnp.transpose(y, (1, 2, 0, 3))  # back to HWBC


def _make_case(rng, H, W, B, C, Cp, hidden, with_s):
    x = jnp.asarray(rng.randn(H, W, B, C) * 0.5, jnp.float32)
    p = {
        "dww": jnp.asarray(rng.randn(7, 7, 1, C) * 0.1, jnp.float32),
        "dwb": jnp.asarray(rng.randn(C) * 0.1, jnp.float32),
        "lns": jnp.asarray(1.0 + 0.1 * rng.randn(C), jnp.float32),
        "lnb": jnp.asarray(0.1 * rng.randn(C), jnp.float32),
        "w1": jnp.asarray(rng.randn(C, hidden) * (C ** -0.5), jnp.float32),
        "b1": jnp.asarray(0.1 * rng.randn(hidden), jnp.float32),
        "w2": jnp.asarray(rng.randn(hidden, C) * (hidden ** -0.5), jnp.float32),
        "b2": jnp.asarray(0.1 * rng.randn(C), jnp.float32),
        "gamma": jnp.asarray(0.5 + 0.1 * rng.randn(C), jnp.float32),
    }
    if with_s:
        s = jnp.asarray((rng.rand(B) > 0.3).astype(np.float32) / 0.7)
    else:
        s = jnp.ones((B,), jnp.float32)
    dy = jnp.asarray(rng.randn(H, W, B, C), jnp.float32)
    return x, p, s, dy


def _xla_grads(x, p, s, dy):
    def loss(x, p):
        return jnp.sum(_ref_forward(x, p, s) * dy)

    return jax.grad(loss, argnums=(0, 1))(x, p)


def _kernel_grads(x, p, s, dy, Cp, ht, mrows=1):
    H, W, B, C = x.shape
    pc = Cp - C

    def padl(a):  # pad channel lanes of an activation
        return jnp.pad(a, ((0, 0),) * 3 + ((0, pc),))

    xb = jnp.transpose(x, (2, 0, 1, 3))
    d = jax.lax.conv_general_dilated(
        xb, p["dww"], (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C) + p["dwb"]
    d = jnp.transpose(d, (1, 2, 0, 3))
    dx, grads = fused_block_bwd_hwbc(
        padl(x), padl(d), padl(dy),
        p["dww"].reshape(7, 7, C), p["lns"], p["lnb"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"], s,
        ht=ht, mrows=mrows)
    return dx[..., :C], grads


def _assert_close(a, b, name, rtol=2e-4, atol=2e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(1.0, float(np.abs(b).max()))
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol * scale,
                               err_msg=name)


@pytest.mark.parametrize("geom", [
    # (H, W, B, C, Cp, hidden, ht): even tiles, ragged last tile, 2 batch
    # groups, padded channel lanes, multi-128 channels
    (8, 5, 16, 128, 128, 512, 4),
    (11, 5, 16, 128, 128, 512, 4),   # ragged: ht_last = 3
    (8, 4, 32, 64, 128, 256, 4),     # BG=2, padded lanes
    (9, 3, 16, 256, 256, 1024, 3),   # CB=2, n_h=3
])
def test_bwd_matches_xla_grad(geom):
    H, W, B, C, Cp, hidden, ht = geom
    rng = np.random.RandomState(0)
    x, p, s, dy = _make_case(rng, H, W, B, C, Cp, hidden, with_s=False)
    dx_ref, gp_ref = _xla_grads(x, p, s, dy)
    dx, grads = _kernel_grads(x, p, s, dy, Cp, ht)

    _assert_close(dx, dx_ref, "dx")
    _assert_close(grads["dwconv"]["w"], gp_ref["dww"], "dww")
    _assert_close(grads["dwconv"]["b"], gp_ref["dwb"], "dwb")
    _assert_close(grads["norm"]["scale"], gp_ref["lns"], "lns")
    _assert_close(grads["norm"]["bias"], gp_ref["lnb"], "lnb")
    _assert_close(grads["pwconv1"]["w"], gp_ref["w1"], "w1")
    _assert_close(grads["pwconv1"]["b"], gp_ref["b1"], "b1")
    _assert_close(grads["pwconv2"]["w"], gp_ref["w2"], "w2")
    _assert_close(grads["pwconv2"]["b"], gp_ref["b2"], "b2")
    _assert_close(grads["gamma"], gp_ref["gamma"], "gamma")


def test_bwd_drop_path_scale():
    """Per-sample drop-path scale s folds into every gradient correctly."""
    rng = np.random.RandomState(1)
    x, p, s, dy = _make_case(rng, 8, 5, 32, 64, 128, 256, with_s=True)
    dx_ref, gp_ref = _xla_grads(x, p, s, dy)
    dx, grads = _kernel_grads(x, p, s, dy, 128, ht=4)
    _assert_close(dx, dx_ref, "dx")
    _assert_close(grads["pwconv1"]["w"], gp_ref["w1"], "w1")
    _assert_close(grads["pwconv2"]["w"], gp_ref["w2"], "w2")
    _assert_close(grads["dwconv"]["w"], gp_ref["dww"], "dww")
    _assert_close(grads["gamma"], gp_ref["gamma"], "gamma")


def test_bwd_pad_lane_invariants():
    """Padded channel lanes of dx stay exactly zero (chain invariant)."""
    rng = np.random.RandomState(2)
    x, p, s, dy = _make_case(rng, 8, 4, 16, 64, 128, 256, with_s=False)
    dx, _ = _kernel_grads(x, p, s, dy, 128, ht=4)
    # _kernel_grads slices to C; redo unsliced for the invariant
    H, W, B, C = x.shape

    def padl(a):
        return jnp.pad(a, ((0, 0),) * 3 + ((0, 128 - C),))

    xb = jnp.transpose(x, (2, 0, 1, 3))
    d = jax.lax.conv_general_dilated(
        xb, p["dww"], (1, 1), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C) + p["dwb"]
    d = jnp.transpose(d, (1, 2, 0, 3))
    dx_full, _ = fused_block_bwd_hwbc(
        padl(x), padl(d), padl(dy),
        p["dww"].reshape(7, 7, C), p["lns"], p["lnb"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"],
        jnp.ones((B,), jnp.float32), ht=4)
    assert float(jnp.abs(dx_full[..., C:]).max()) == 0.0
