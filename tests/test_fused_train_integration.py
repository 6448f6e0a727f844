"""cfg.fused_train_blocks: fused-kernel training path == XLA training path.

Drives forward_features end-to-end in TRAIN mode (train_key set) with the
fused custom-VJP block path on stages 3-4 and checks value AND gradients
(all trunk params + input cotangent) against the plain XLA path, including
active per-sample drop-path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.models import convnext as F


def _grads(cfg, params, x, r, key, monkeypatch, bwd_tiles):
    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)
    monkeypatch.setattr(F, "_BWD_STAGE_TILES", bwd_tiles)

    def loss(params, x):
        emb = F.forward_features(x, params, cfg, train_key=key)
        return jnp.sum(emb * r)

    (val, g) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)
    return val, g


def _max_diff(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    worst = 0.0
    for x, y in zip(la, lb):
        x = np.asarray(x, np.float32)
        y = np.asarray(y, np.float32)
        assert np.isfinite(x).all() and np.isfinite(y).all()
        worst = max(worst, float(np.abs(x - y).max())
                    / max(1.0, float(np.abs(y).max())))
    return worst


@pytest.mark.parametrize("dp_rate", [0.0, 0.3])
def test_fused_train_matches_xla(dp_rate, monkeypatch):
    rng = np.random.RandomState(0)
    base = dict(depths=(1, 1, 2, 1), dims=(32, 64, 128, 256),
                drop_path_rate=dp_rate, block_impl="xla_approx")
    cfg_f = ConvNeXtConfig(fused_train_blocks=True, **base)
    cfg_x = ConvNeXtConfig(fused_train_blocks=False, **base)
    params = F.init_params(jax.random.PRNGKey(0), cfg_f)
    # (B=16, T=240, M=56): stage-3 H=15 (ht=5 -> 3 tiles), stage-4 H=7
    # (ht=4 -> tiles 4+3) - exercises ragged last tiles in the backward
    x = jnp.asarray(rng.randn(16, 240, 56, 1) * 0.5, jnp.float32)
    r = jnp.asarray(rng.randn(16, 256), jnp.float32)
    key = jax.random.PRNGKey(7)

    val_f, g_f = _grads(cfg_f, params, x, r, key, monkeypatch, {2: (5, 1), 3: (4, 2)})
    val_x, g_x = _grads(cfg_x, params, x, r, key, monkeypatch, {2: (5, 1), 3: (4, 2)})

    assert abs(float(val_f) - float(val_x)) < 2e-3 * max(1.0, abs(float(val_x)))
    assert _max_diff(g_f[0], g_x[0]) < 3e-4  # param grads
    assert _max_diff(g_f[1], g_x[1]) < 3e-4  # input cotangent


def test_fused_train_bf16(monkeypatch):
    """bf16 activations (the production training dtype) stay finite and
    match the XLA path within bf16 tolerance."""
    rng = np.random.RandomState(3)
    base = dict(depths=(1, 1, 2, 1), dims=(32, 64, 128, 256),
                drop_path_rate=0.0, block_impl="xla_approx")
    cfg_f = ConvNeXtConfig(fused_train_blocks=True, **base)
    cfg_x = ConvNeXtConfig(fused_train_blocks=False, **base)
    params = F.init_params(jax.random.PRNGKey(0), cfg_f)
    x = jnp.asarray(rng.randn(16, 240, 56, 1) * 0.5, jnp.bfloat16)
    r = jnp.asarray(rng.randn(16, 256), jnp.float32)
    key = jax.random.PRNGKey(11)

    val_f, g_f = _grads(cfg_f, params, x, r, key, monkeypatch,
                        {2: (5, 1), 3: (4, 2)})
    val_x, g_x = _grads(cfg_x, params, x, r, key, monkeypatch,
                        {2: (5, 1), 3: (4, 2)})
    assert abs(float(val_f) - float(val_x)) < 3e-2 * max(1.0, abs(float(val_x)))
    assert _max_diff(g_f[0], g_x[0]) < 5e-2


def test_fused_train_geometry_fallback(monkeypatch):
    """Stage heights that fail the backward DMA geometry fall back to the
    XLA path (same values, no crash)."""
    rng = np.random.RandomState(1)
    base = dict(depths=(1, 1, 1, 1), dims=(32, 64, 128, 256),
                drop_path_rate=0.0, block_impl="xla_approx")
    cfg_f = ConvNeXtConfig(fused_train_blocks=True, **base)
    cfg_x = ConvNeXtConfig(fused_train_blocks=False, **base)
    params = F.init_params(jax.random.PRNGKey(0), cfg_f)
    x = jnp.asarray(rng.randn(16, 120, 56, 1) * 0.5, jnp.float32)
    key = jax.random.PRNGKey(3)
    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)
    # default _BWD_STAGE_TILES: stage-3 H=7 with ht=7 -> n_h=1 -> fallback
    a = F.forward_features(x, params, cfg_f, train_key=key)
    b = F.forward_features(x, params, cfg_x, train_key=key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
