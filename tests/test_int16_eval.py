"""int16 device-decode eval path: numerics match host-decoded float32."""

import numpy as np
import pytest

import jax

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.data import AudioSetDataset, DataLoader, EvaluateSampler
from audioset_convnext_inf_tpu.engine import Evaluator
from audioset_convnext_inf_tpu.models import convnext as F
from tests.make_synth_hdf5 import make_packed_and_index


def test_int16_device_decode_matches_host_decode(tmp_path, rng):
    packed, index = make_packed_and_index(str(tmp_path), n_clips=8, clip_samples=16000)
    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    ev = Evaluator(params, cfg)

    def probs(keep16):
        loader = DataLoader(
            AudioSetDataset(keep_int16=keep16),
            EvaluateSampler(index, batch_size=8),
            num_workers=2,
            pad_to_batch_size=8,
        )
        return ev.infer_probs(loader)["clipwise_output"]

    a = probs(False)
    b = probs(True)
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_keep_int16_dataset_dtype(tmp_path):
    packed, _ = make_packed_and_index(str(tmp_path) + "/x", n_clips=2, clip_samples=8000)
    ds = AudioSetDataset(keep_int16=True)
    item = ds[{"hdf5_path": packed, "index_in_hdf5": 0}]
    assert item["waveform"].dtype == np.int16
    # decimating sample rates force host decode regardless
    ds16 = AudioSetDataset(sample_rate=16000, keep_int16=True)
    item16 = ds16[{"hdf5_path": packed, "index_in_hdf5": 0}]
    assert item16["waveform"].dtype == np.float32
