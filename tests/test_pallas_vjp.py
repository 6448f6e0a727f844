"""Custom-VJP fused tail: gradients match the XLA tanh-GELU reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.ops.pallas_block import (
    _tail_reference_math,
    fused_ln_mlp_residual_trainable,
)


def _inputs(rng, c=64, tokens=48):
    x = jnp.asarray(rng.randn(tokens, c) * 0.5, jnp.float32)
    res = jnp.asarray(rng.randn(tokens, c) * 0.5, jnp.float32)
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    w1 = jnp.asarray(rng.randn(c, 4 * c) * 0.05, jnp.float32)
    b1 = jnp.zeros((4 * c,))
    w2 = jnp.asarray(rng.randn(4 * c, c) * 0.05, jnp.float32)
    b2 = jnp.zeros((c,))
    gamma = jnp.asarray(rng.rand(c) * 0.1, jnp.float32)
    return (x, res, scale, bias, w1, b1, w2, b2, gamma)


def test_trainable_tail_forward_matches_reference(rng):
    args = _inputs(rng)
    out = fused_ln_mlp_residual_trainable(*args, 1e-6)
    ref = _tail_reference_math(*args, 1e-6)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_trainable_tail_grads_match_reference(rng):
    args = _inputs(rng)

    def loss_fused(*a):
        return jnp.sum(fused_ln_mlp_residual_trainable(*a, 1e-6) ** 2)

    def loss_ref(*a):
        return jnp.sum(_tail_reference_math(*a, 1e-6) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 2, 4, 6, 8))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 2, 4, 6, 8))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_train_step_uses_fused_block_without_droppath(rng):
    """Trainer with block_impl=pallas + drop_path 0 runs and decreases loss."""
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                         drop_path_rate=0.0, block_impl="pallas")
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, TrainConfig(max_lr=1e-3, total_steps=100), params)
    wav = (rng.randn(8, 32000) * 0.1).astype(np.float32)
    tgt = np.zeros((8, 527), np.float32)
    tgt[:, 3] = 1
    losses = [tr.step(wav, tgt) for _ in range(5)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
