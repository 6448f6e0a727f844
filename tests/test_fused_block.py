"""Fully-fused ConvNeXt block kernel (dwconv + LN + MLP + residual).

Parity targets: the composed reference math of pytorch/convnext.py:58-87
(with the repo's tanh-GELU convention shared by the Pallas tail), and the
integrated forward_features fused-stage path vs the unfused Pallas path.
"""

import dataclasses
import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.ops.pallas_fused_block import fused_block_hwbc

K, P = 7, 3


def _block_params(rng, c):
    return dict(
        dw_w=jnp.asarray(rng.randn(K, K, c) * 0.05, jnp.float32),
        dw_b=jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        ln_scale=jnp.asarray(1 + rng.randn(c) * 0.05, jnp.float32),
        ln_bias=jnp.asarray(rng.randn(c) * 0.05, jnp.float32),
        w1=jnp.asarray(rng.randn(c, 4 * c) * 0.03, jnp.float32),
        b1=jnp.asarray(rng.randn(4 * c) * 0.03, jnp.float32),
        w2=jnp.asarray(rng.randn(4 * c, c) * 0.03, jnp.float32),
        b2=jnp.asarray(rng.randn(c) * 0.03, jnp.float32),
        gamma=jnp.asarray(rng.randn(c) * 0.2, jnp.float32),
    )


def _reference_block(x_nhwc, p):
    """Composed XLA math with the kernel's tanh GELU."""
    c = x_nhwc.shape[-1]
    d = jax.lax.conv_general_dilated(
        x_nhwc, p["dw_w"].reshape(K, K, 1, c), (1, 1), ((P, P), (P, P)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    ) + p["dw_b"]
    mean = jnp.mean(d, -1, keepdims=True)
    var = jnp.var(d, -1, keepdims=True)
    xn = (d - mean) * jax.lax.rsqrt(var + 1e-6) * p["ln_scale"] + p["ln_bias"]
    h1 = jax.nn.gelu(xn @ p["w1"] + p["b1"], approximate=True)
    return x_nhwc + (h1 @ p["w2"] + p["b2"]) * p["gamma"]


@pytest.mark.parametrize(
    "shape,cp,ht,mrows",
    [
        ((13, 14, 32, 96), 128, 2, 2),   # C-padded, ragged H, n_h%3==1
        ((12, 7, 16, 128), 128, 4, 1),   # exact C, single batch group
        ((9, 4, 48, 64), 128, 2, 1),     # 3 batch groups, n_h%3==2
    ],
)
def test_fused_block_matches_composed_math(rng, shape, cp, ht, mrows):
    h, w, b, c = shape
    p = _block_params(rng, c)
    x = jnp.asarray(rng.randn(h, w, b, c) * 0.5, jnp.float32)
    xh = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    y = fused_block_hwbc(
        xh, p["dw_w"], p["dw_b"], p["ln_scale"], p["ln_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"],
        ht=ht, mrows=mrows)
    assert y.shape == (h, w, b, cp)
    # channel padding must stay exactly zero (downstream blocks rely on it)
    if cp > c:
        assert float(jnp.max(jnp.abs(y[..., c:]))) == 0.0
    ref = _reference_block(jnp.transpose(x, (2, 0, 1, 3)), p)
    got = jnp.transpose(y[..., :c], (2, 0, 1, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


@pytest.mark.parametrize(
    "shape,ht",
    [
        ((31, 7, 16, 128), 4),   # stage-4 geometry: ragged padless, ht_last=3
        ((11, 5, 16, 128), 4),   # n_h=3, ht_last=3 (minimum ragged tail)
        ((15, 4, 32, 96), 6),    # ht_last=3 with C-padding + 2 batch groups
    ],
)
def test_fused_block_ragged_padless(rng, shape, ht):
    """H % ht != 0 with ht_last >= P takes the padless boundary-DMA path
    (verified by construction: n_h >= 2, ht >= P, ht_last >= P) and must
    still match the composed math - the trailing output rows computed from
    zeroed scratch are sliced off."""
    h, w, b, c = shape
    cp = -(-c // 128) * 128
    assert h % ht != 0 and h - (h // ht) * ht >= P  # really ragged-padless
    p = _block_params(rng, c)
    x = jnp.asarray(rng.randn(h, w, b, c) * 0.5, jnp.float32)
    xh = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - c)))
    y = fused_block_hwbc(
        xh, p["dw_w"], p["dw_b"], p["ln_scale"], p["ln_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"], ht=ht, mrows=1)
    assert y.shape == (h, w, b, cp)
    if cp > c:
        assert float(jnp.max(jnp.abs(y[..., c:]))) == 0.0
    ref = _reference_block(jnp.transpose(x, (2, 0, 1, 3)), p)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y[..., :c], (2, 0, 1, 3))),
        np.asarray(ref), atol=3e-5)


def test_fused_block_no_gamma(rng):
    h, w, b, c = 8, 5, 16, 128
    p = _block_params(rng, c)
    x = jnp.asarray(rng.randn(h, w, b, c) * 0.5, jnp.float32)
    y = fused_block_hwbc(
        x, p["dw_w"], p["dw_b"], p["ln_scale"], p["ln_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], None, ht=2, mrows=1)
    p1 = dict(p, gamma=jnp.ones_like(p["gamma"]))
    ref = _reference_block(jnp.transpose(x, (2, 0, 1, 3)), p1)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y, (2, 0, 1, 3))), np.asarray(ref), atol=3e-5)


def test_forward_features_fused_stages_match_unfused(rng, monkeypatch):
    """The fused-stage path equals the per-op Pallas path (same tanh GELU)."""
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(depths=(1, 1, 2, 1), dims=(32, 64, 128, 256),
                         drop_path_rate=0.0, block_impl="xla_approx")
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(16, 120, 56, 1) * 0.5, jnp.float32)

    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)
    fused = F.forward_features(x, params, cfg)
    with monkeypatch.context() as m:
        m.setattr(F, "_FUSED_STAGE_TILES", {})
        unfused = F.forward_features(x, params, cfg)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=5e-5)

    # frame embeddings keep the reference (B, H, W, C) view
    ff = F.forward_features(x, params, cfg, return_frame_embeddings=True)
    with monkeypatch.context() as m:
        m.setattr(F, "_FUSED_STAGE_TILES", {})
        fu = F.forward_features(x, params, cfg, return_frame_embeddings=True)
    assert ff.shape == fu.shape
    np.testing.assert_allclose(np.asarray(ff), np.asarray(fu), atol=5e-5)


def test_forward_features_fused_gates(rng, monkeypatch):
    """Batches not divisible by 16 fall back to the XLA path; dims not
    divisible by 128 do NOT fall back - they run the fused kernel with
    zero-padded channel lanes and must match the unfused path in value."""
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F

    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(32, 64, 128, 256),
                         drop_path_rate=0.0, block_impl="xla_approx")
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(3, 120, 56, 1) * 0.5, jnp.float32)
    y = F.forward_features(x, params, cfg)  # B=3: must not hit the kernel
    assert y.shape == (3, 256)

    # dims % 128 != 0: the fused stages run channel-padded. Verify the fused
    # path is actually taken (fused_block_hwbc called) and matches unfused.
    cfg2 = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(24, 48, 96, 192),
                          drop_path_rate=0.0, block_impl="xla_approx")
    params2 = F.init_params(jax.random.PRNGKey(0), cfg2)
    x2 = jnp.asarray(rng.randn(16, 120, 56, 1), jnp.float32)

    from audioset_convnext_inf_tpu.ops import pallas_fused_block as PFB

    calls = []
    orig = PFB.fused_block_hwbc

    def counting(*a, **kw):
        calls.append(a[0].shape)
        return orig(*a, **kw)

    monkeypatch.setattr(PFB, "fused_block_hwbc", counting)
    y2 = F.forward_features(x2, params2, cfg2)
    assert y2.shape == (16, 192)
    assert len(calls) == len(F._FUSED_STAGE_TILES)  # fused path really taken
    assert all(s[-1] % 128 == 0 for s in calls)  # with padded channel lanes

    with monkeypatch.context() as m:
        m.setattr(F, "_FUSED_STAGE_TILES", {})
        y2_unfused = F.forward_features(x2, params2, cfg2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y2_unfused), atol=5e-5)


def test_bf16_serving_config_defaults():
    """Guard the shipped serving configuration: bf16 through the model API
    must select tanh-GELU blocks, and the fused stages must stay registered
    for the tiny/base channel widths (NOTES.md round-2 perf state)."""
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.models.api import ConvNeXt

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                         drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    # the auto-switch is audible: an explicitly-passed block_impl="xla" is
    # indistinguishable from the dataclass default, so the API warns, and
    # the one warning names BOTH switches (GELU flavor + frontend precision)
    with pytest.warns(UserWarning, match="'xla' -> 'xla_approx'") as rec:
        m = ConvNeXt(cfg, params, compute_dtype=jnp.bfloat16)
    assert any("'highest' -> 'default'" in str(w.message) for w in rec)
    assert m.cfg.block_impl == "xla_approx"
    assert m.cfg.frontend.precision == "default"
    # an explicit non-default frontend precision is left alone (only the
    # dataclass-default "highest" auto-switches)
    from audioset_convnext_inf_tpu.config import FrontendConfig

    cfg_high = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                              drop_path_rate=0.0, block_impl="xla_approx",
                              frontend=FrontendConfig(precision="high"))
    m_high = ConvNeXt(cfg_high, F.init_params(jax.random.PRNGKey(0), cfg_high),
                      compute_dtype=jnp.bfloat16)
    assert m_high.cfg.frontend.precision == "high"
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")  # record; only the targeted message fails
        m2 = ConvNeXt(cfg, params, compute_dtype=jnp.bfloat16,
                      auto_fast_serving=False)
        m3 = ConvNeXt(cfg, params)  # f32 keeps the exact-erf parity path
    # no auto-switch warning when the caller opted out (unrelated warnings,
    # e.g. future JAX deprecations, must not fail this test)
    assert not [w for w in caught if "auto-switched" in str(w.message)]
    assert m2.cfg.block_impl == "xla" and m2.cfg.frontend.precision == "highest"
    assert m3.cfg.block_impl == "xla" and m3.cfg.frontend.precision == "highest"

    assert set(F._FUSED_STAGE_TILES) == {2, 3}
    for tile in F._FUSED_STAGE_TILES.values():
        ht, mrows = tile[0], tile[1]
        assert ht % mrows == 0
        if len(tile) > 2:
            assert tile[2] >= 1  # wch (stencil w-chunk)


def test_fused_block_two_tile_padless(rng):
    """n_h == 2 (H = 2*ht): the padless DMA path has only first/last tile
    classes - the interior class's descriptor would be statically invalid
    (HT+2P rows > H) and must not be constructed. This is the 1-s-clip
    flagship stage-3 geometry (H=6, ht=3) used by dryrun_multichip."""
    h, w, b, c = 6, 14, 16, 128
    p = _block_params(rng, c)
    x = jnp.asarray(rng.randn(h, w, b, c) * 0.5, jnp.float32)
    y = fused_block_hwbc(
        x, p["dw_w"], p["dw_b"], p["ln_scale"], p["ln_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"], ht=3, mrows=1, wch=14)
    ref = _reference_block(jnp.transpose(x, (2, 0, 1, 3)), p)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y, (2, 0, 1, 3))), np.asarray(ref), atol=3e-5)


def test_fused_block_single_tile(rng):
    """H < ht degenerates to one pipeline tile (n_h == 1): the steady-state
    region never fires and the stencil/tail run in separate boundary steps."""
    h, w, b, c = 3, 5, 16, 128
    p = _block_params(rng, c)
    x = jnp.asarray(rng.randn(h, w, b, c) * 0.5, jnp.float32)
    y = fused_block_hwbc(
        x, p["dw_w"], p["dw_b"], p["ln_scale"], p["ln_bias"],
        p["w1"], p["b1"], p["w2"], p["b2"], p["gamma"], ht=4, mrows=1)
    ref = _reference_block(jnp.transpose(x, (2, 0, 1, 3)), p)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(y, (2, 0, 1, 3))), np.asarray(ref), atol=3e-5)
