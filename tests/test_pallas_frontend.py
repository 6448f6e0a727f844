"""Fused Pallas frontend vs the plain-XLA reference implementation.

Runs in interpreter mode on CPU (same kernel code path as TPU modulo
Mosaic lowering); the TPU-compiled kernel is exercised by bench.py and the
frontend benchmarks.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import FrontendConfig
from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend, log_mel_spectrogram
from audioset_convnext_inf_tpu.ops.pallas_frontend import fused_log_mel_spectrogram


def test_fused_matches_reference_impl(rng):
    cfg = FrontendConfig()
    x = (rng.randn(2, 32000) * 0.1).astype(np.float32)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg))
    fused = np.asarray(fused_log_mel_spectrogram(jnp.asarray(x), cfg))
    assert fused.shape == ref.shape == (2, 1, cfg.num_frames(32000), 224)
    np.testing.assert_allclose(fused, ref, atol=2e-3)


def test_fused_full_clip_shape(rng):
    cfg = FrontendConfig()
    x = (rng.randn(1, 320000) * 0.05).astype(np.float32)
    fused = np.asarray(fused_log_mel_spectrogram(jnp.asarray(x), cfg))
    assert fused.shape == (1, 1, 1001, 224)
    ref = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg))
    np.testing.assert_allclose(fused, ref, atol=2e-3)


def test_frontend_impl_switch(rng):
    cfg = FrontendConfig(impl="pallas")
    fe = LogMelFrontend(cfg)
    x = (rng.randn(1, 32000) * 0.1).astype(np.float32)
    out = np.asarray(fe(jnp.asarray(x)))
    ref = np.asarray(LogMelFrontend(FrontendConfig(impl="xla"))(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-3)
