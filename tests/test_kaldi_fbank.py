"""Kaldi fbank property tests (torchaudio is unavailable as an oracle; these
pin the Kaldi-spec behaviors the reference mode depends on)."""

import numpy as np
import pytest

from audioset_convnext_inf_tpu.ops.kaldi_fbank import kaldi_fbank


def test_frame_count_matches_reference_shape(rng):
    """10 s @ 32 kHz, 64 ms / 10 ms -> 994 frames x 224 bins - the exact
    shape the reference prints for use_torchaudio (convnext.py:302)."""
    x = (rng.randn(320000) * 0.1).astype(np.float32)
    out = kaldi_fbank(x)
    assert out.shape == (994, 224)
    assert np.isfinite(out).all()


def test_batched_matches_single(rng):
    x = (rng.randn(2, 64000) * 0.1).astype(np.float32)
    out = kaldi_fbank(x)
    np.testing.assert_allclose(out[0], kaldi_fbank(x[0]), atol=5e-4)


def test_silence_hits_log_floor():
    out = kaldi_fbank(np.zeros(32000, np.float32))
    np.testing.assert_allclose(out, np.log(1.1920928955078125e-07), atol=1e-4)


def test_dc_offset_removed(rng):
    x = (rng.randn(64000) * 0.1).astype(np.float32)
    np.testing.assert_allclose(kaldi_fbank(x), kaldi_fbank(x + 0.5), atol=0.2)


def test_tone_lands_in_rising_mel_bin():
    """A 1 kHz tone's peak bin must sit below a 4 kHz tone's peak bin."""
    t = np.arange(320000) / 32000.0
    lo = kaldi_fbank(np.sin(2 * np.pi * 1000 * t).astype(np.float32)).mean(0)
    hi = kaldi_fbank(np.sin(2 * np.pi * 4000 * t).astype(np.float32)).mean(0)
    assert lo.argmax() < hi.argmax()


def test_dataset_fbank_mode(tmp_path):
    from audioset_convnext_inf_tpu.data import AudioSetDataset
    from tests.make_synth_hdf5 import make_packed_and_index

    packed, _ = make_packed_and_index(str(tmp_path), n_clips=2, clip_samples=64000)
    ds = AudioSetDataset(use_kaldi_fbank=True)
    item = ds[{"hdf5_path": packed, "index_in_hdf5": 0}]
    assert "fbank" in item and "waveform" not in item
    assert item["fbank"].shape[1] == 224
