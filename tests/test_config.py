"""Config tree, labels, and schedule tests."""

import numpy as np
import pytest

from audioset_convnext_inf_tpu.config import (
    ConvNeXtConfig,
    FrontendConfig,
    config_to_json,
    convnext_config_from_json,
)
from audioset_convnext_inf_tpu.labels import read_audioset_label_tags


def test_config_json_roundtrip():
    cfg = ConvNeXtConfig(
        name="rt", depths=(1, 2, 3, 4), dims=(8, 16, 32, 64),
        drop_path_rate=0.3, after_stem_dim=(504, 28), block_impl="xla_approx",
        frontend=FrontendConfig(n_mels=64, precision="high"),
    )
    cfg2 = convnext_config_from_json(config_to_json(cfg))
    assert cfg2.depths == (1, 2, 3, 4)
    assert cfg2.after_stem_dim == (504, 28)
    assert cfg2.frontend.n_mels == 64
    assert cfg2.frontend.precision == "high"
    assert cfg2.block_impl == "xla_approx"
    assert cfg2.augment.spec_augment.freq_drop_width == 28


def test_labels_csv():
    lm = read_audioset_label_tags()
    assert lm.classes_num == 527
    assert lm.labels[0] == "Speech"
    assert lm.id_to_ix["/m/09x0r"] == 0
    assert lm.ix_to_lb[137] == "Music"


def test_wd_schedule_shapes():
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, wd_schedule

    cfg = TrainConfig(weight_decay=0.01, use_wd_schedule=True, total_steps=1000)
    s = wd_schedule(cfg)
    assert float(s(0)) == pytest.approx(0.01)  # constant cooldown
    assert float(s(299)) == pytest.approx(0.01)
    assert float(s(999)) == pytest.approx(0.02, rel=1e-3)  # warmed to 2x

    cfg2 = TrainConfig(weight_decay=0.01, use_wd_schedule=True,
                       wd_constant_cooldown=False, total_steps=1000)
    s2 = wd_schedule(cfg2)
    assert float(s2(0)) == pytest.approx(0.01)  # cosine starts at base
    assert float(s2(299)) < 0.0021  # decays toward wd/5


def test_frontend_num_frames_table():
    fe = FrontendConfig()
    assert fe.num_frames(320000) == 1001
    assert fe.freq_bins == 513
    fe16 = FrontendConfig(sample_rate=16000, n_fft=512, win_length=512, hop_length=160)
    assert fe16.num_frames(160000) == 1001
