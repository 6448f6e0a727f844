"""Frontend parity tests: framing, STFT-vs-torch, mel bank vs transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import FrontendConfig
from audioset_convnext_inf_tpu.ops.frontend import (
    LogMelFrontend,
    frame_signal,
    hann_window_periodic,
    log_mel_spectrogram,
    mel_filterbank,
    power_spectrogram,
)


def test_frame_signal_matches_naive(rng):
    n_fft, hop, num_frames = 1024, 320, 11
    length = (num_frames - 1) * hop + n_fft
    x = rng.randn(2, length).astype(np.float32)
    frames = np.asarray(frame_signal(jnp.asarray(x), n_fft, hop, num_frames))
    for i in range(num_frames):
        np.testing.assert_array_equal(frames[:, i, :], x[:, i * hop : i * hop + n_fft])


def test_hann_window_matches_torch():
    import torch

    w = hann_window_periodic(1024)
    wt = torch.hann_window(1024, periodic=True, dtype=torch.float64).numpy()
    np.testing.assert_allclose(w, wt, atol=1e-12)


def test_power_spectrogram_matches_torch_stft(rng):
    import torch

    cfg = FrontendConfig()
    n = 32000  # 1 second keeps the test fast
    x = rng.randn(2, n).astype(np.float32)
    ours = np.asarray(power_spectrogram(jnp.asarray(x), cfg))

    window = torch.hann_window(1024, periodic=True, dtype=torch.float64)
    ref = torch.stft(
        torch.from_numpy(x).double(),
        n_fft=1024,
        hop_length=320,
        win_length=1024,
        window=window,
        center=True,
        pad_mode="reflect",
        return_complex=True,
    )
    ref_power = (ref.real**2 + ref.imag**2).transpose(1, 2).numpy()  # (B, T, F)

    assert ours.shape == ref_power.shape == (2, cfg.num_frames(n), 513)
    # float32 GEMM-DFT vs float64 FFT: relative tolerance scaled by spectrum peak
    np.testing.assert_allclose(ours, ref_power, atol=1e-2 * ref_power.max(), rtol=2e-3)


def test_num_frames_ten_seconds():
    cfg = FrontendConfig()
    assert cfg.num_frames(320000) == 1001  # SURVEY.md section 7.3


def test_mel_filterbank_matches_transformers():
    from transformers.audio_utils import mel_filter_bank

    ours = mel_filterbank(32000, 1024, 224, 50.0, 14000.0, dtype=np.float64)
    ref = mel_filter_bank(
        num_frequency_bins=513,
        num_mel_filters=224,
        min_frequency=50.0,
        max_frequency=14000.0,
        sampling_rate=32000,
        norm="slaney",
        mel_scale="slaney",
    ).T  # transformers returns (freq, mel)
    assert ref.shape == ours.shape == (224, 513)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


def test_log_mel_pipeline_matches_torch_oracle(rng):
    from tests.torch_oracle import oracle_logmel

    cfg = FrontendConfig()
    x = (rng.randn(2, 32000) * 0.1).astype(np.float32)
    mel_w = mel_filterbank(32000, 1024, 224, 50.0, 14000.0, dtype=np.float64)
    ref = oracle_logmel(x, mel_w)
    ours = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg))
    assert ours.shape == ref.shape
    # log-domain comparison: tight absolute tolerance in dB
    np.testing.assert_allclose(ours, ref, atol=2e-2)


def test_frontend_callable_shapes():
    fe = LogMelFrontend(FrontendConfig())
    x = jnp.zeros((3, 320000), jnp.float32)
    out = fe(x)
    assert out.shape == (3, 1, 1001, 224)
    # all-zero signal: log10(clip(0, 1e-10)) * 10 = -100 everywhere
    np.testing.assert_allclose(np.asarray(out), -100.0, atol=1e-3)


def test_bn0_fold_matches_unfused_path(rng):
    """Eval-mode bn0 folded into the frontend's log chain (affine=(a,b))
    must equal frontend -> explicit batch_norm_apply (VERDICT round-2 #3)."""
    import jax

    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import layers as L
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    cfg = ConvNeXtConfig()
    fe = LogMelFrontend(cfg.frontend)
    wav = jnp.asarray((rng.randn(2, 32000) * 0.1).astype(np.float32))
    bn = {
        "scale": jnp.asarray(rng.uniform(0.5, 2.0, 224).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(224).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(224).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 224).astype(np.float32)),
    }
    a = bn["scale"] * jax.lax.rsqrt(bn["var"] + cfg.bn_eps)
    b = bn["bias"] - a * bn["mean"]

    folded = np.asarray(fe(wav, affine=(a, b)))[:, 0]  # (B, T, M)
    unfused = np.asarray(
        L.batch_norm_apply(fe(wav)[:, 0], bn, eps=cfg.bn_eps, axis=2)
    )
    np.testing.assert_allclose(folded, unfused, atol=1e-5)


def test_bn0_fold_in_model_forward(rng):
    """Full forward (which now takes the folded path in eval) still matches
    the manual frontend -> bn0 -> features composition."""
    import jax

    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.models import layers as L
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(32, 64, 128, 256))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    params["bn0"] = {
        "scale": jnp.asarray(rng.uniform(0.5, 2.0, 224).astype(np.float32)),
        "bias": jnp.asarray(rng.randn(224).astype(np.float32)),
        "mean": jnp.asarray(rng.randn(224).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 224).astype(np.float32)),
    }
    wav = jnp.asarray((rng.randn(1, 32000) * 0.1).astype(np.float32))
    out = F.forward(params, wav, cfg)["clipwise_logits"]

    fe = LogMelFrontend(cfg.frontend)
    spec = jnp.transpose(fe(wav), (0, 2, 3, 1))
    xm = L.batch_norm_apply(jnp.squeeze(spec, -1), params["bn0"], eps=cfg.bn_eps, axis=2)
    emb = F.forward_features(xm[..., None], params, cfg)
    ref = L.linear(emb, params["head"]["w"], params["head"]["b"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_ct_dft_matches_direct(rng):
    """Cooley-Tukey GEMM-DFT == direct GEMM-DFT (reordered), and the log-mel
    path with dft_impl='ct' matches 'direct' to ~1e-3 dB."""
    import dataclasses

    from audioset_convnext_inf_tpu.config import FrontendConfig
    from audioset_convnext_inf_tpu.ops import frontend as FE

    wav = jnp.asarray(rng.randn(2, 32000).astype(np.float32) * 0.3)
    cfg_d = FrontendConfig(precision="highest")
    cfg_c = dataclasses.replace(cfg_d, dft_impl="ct")

    p_d = np.asarray(FE.power_spectrogram(wav, cfg_d))
    p_c = np.asarray(FE.power_spectrogram_ct(wav, cfg_c))
    k_of = FE.ct_bin_to_k(cfg_d.n_fft)
    valid = k_of >= 0
    # every one-sided bin is covered exactly once
    assert sorted(k_of[valid]) == list(range(cfg_d.n_fft // 2 + 1))
    p_ck = np.zeros_like(p_d)
    p_ck[..., k_of[valid]] = p_c[..., valid]
    rel = np.abs(p_ck - p_d) / (np.abs(p_d) + 1e-6)
    assert rel.max() < 5e-3, rel.max()

    lm_d = np.asarray(FE.log_mel_spectrogram(wav, cfg_d))
    lm_c = np.asarray(FE.log_mel_spectrogram(wav, cfg_c))
    assert np.abs(lm_d - lm_c).max() < 5e-3  # dB


def test_conv_dft_matches_direct(rng):
    """The conv-DFT (default serving path) == direct framing+GEMM across
    frame geometries: hop dividing n_fft exactly (r=0), ragged tail taps
    (r>0), and the single-tap hop==n_fft case."""
    import dataclasses

    from audioset_convnext_inf_tpu.config import FrontendConfig
    from audioset_convnext_inf_tpu.ops import frontend as FE

    for n_fft, hop in [(1024, 320), (256, 160), (512, 128), (256, 256)]:
        cfg = FrontendConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop,
                             precision="highest")
        wav = jnp.asarray(rng.randn(2, 12800).astype(np.float32) * 0.3)
        p_d = np.asarray(FE.power_spectrogram(wav, cfg))
        p_c = np.asarray(FE.power_spectrogram_conv(wav, cfg))
        assert p_d.shape == p_c.shape, (n_fft, hop)
        rel = np.abs(p_c - p_d) / (np.abs(p_d) + 1e-6)
        assert rel.max() < 5e-3, (n_fft, hop, rel.max())

        lm_d = np.asarray(FE.log_mel_spectrogram(
            wav, dataclasses.replace(cfg, dft_impl="direct")))
        lm_c = np.asarray(FE.log_mel_spectrogram(
            wav, dataclasses.replace(cfg, dft_impl="conv")))
        assert np.abs(lm_d - lm_c).max() < 5e-3, (n_fft, hop)  # dB


def test_rfft_dft_matches_direct(rng):
    """dft_impl="rfft" (XLA native real FFT) == direct framing+GEMM across
    frame geometries, including win_length < n_fft (center-padded window)."""
    import dataclasses

    from audioset_convnext_inf_tpu.config import FrontendConfig
    from audioset_convnext_inf_tpu.ops import frontend as FE

    for n_fft, win, hop in [(1024, 1024, 320), (256, 200, 160), (512, 512, 512)]:
        cfg = FrontendConfig(n_fft=n_fft, win_length=win, hop_length=hop,
                             precision="highest")
        wav = jnp.asarray(rng.randn(2, 12800).astype(np.float32) * 0.3)
        p_d = np.asarray(FE.power_spectrogram(wav, cfg))
        p_r = np.asarray(FE.power_spectrogram_rfft(wav, cfg))
        assert p_d.shape == p_r.shape, (n_fft, win, hop)
        rel = np.abs(p_r - p_d) / (np.abs(p_d) + 1e-6)
        assert rel.max() < 5e-3, (n_fft, win, hop, rel.max())

        lm_d = np.asarray(FE.log_mel_spectrogram(
            wav, dataclasses.replace(cfg, dft_impl="direct")))
        lm_r = np.asarray(FE.log_mel_spectrogram(
            wav, dataclasses.replace(cfg, dft_impl="rfft")))
        assert np.abs(lm_d - lm_r).max() < 5e-3, (n_fft, win, hop)  # dB


def test_ct_factors():
    from audioset_convnext_inf_tpu.ops.frontend import _ct_factors

    assert _ct_factors(1024) == (32, 32)
    p, q = _ct_factors(512)
    assert p * q == 512 and p % 2 == 0
    assert _ct_factors(7) is None  # prime: no even split -> direct fallback
