"""Parity tests for the long-tail utilities: ontology reader, pad_audio,
download command construction, ResNet basic block vs a torch oracle."""

import json

import numpy as np
import pytest


def test_read_audioset_ontology(tmp_path):
    from audioset_convnext_inf_tpu.labels import read_audioset_ontology

    onto = [
        {"id": "/m/09x0r", "name": "Speech", "description": "Human speech."},
        {"id": "/m/notaclass", "name": "X", "description": "ignored"},
        {"id": "/m/04rlf", "name": "Music", "description": "Organized sound."},
    ]
    p = tmp_path / "ontology.json"
    p.write_text(json.dumps(onto))
    sents = read_audioset_ontology(str(p))
    assert sents == ["Human speech.", "Organized sound."]


def test_pad_audio_never_truncates():
    from audioset_convnext_inf_tpu.data.audio_io import pad_audio

    x = np.ones(10, np.float32)
    assert len(pad_audio(x, 20)) == 20
    assert len(pad_audio(x, 5)) == 10  # longer-than-target passes through


def test_download_wavs_builds_commands(tmp_path):
    from audioset_convnext_inf_tpu.data.pack import download_wavs

    csv = tmp_path / "seg.csv"
    csv.write_text(
        "#\n#\n#\n"
        'abc123def45, 30.000, 40.000, "/m/09x0r"\n'
        'xyz987ghi65, 0.000, 10.000, "/m/04rlf"\n'
    )
    cmds = download_wavs(str(csv), str(tmp_path / "audio"), dry_run=True)
    assert len(cmds) == 6  # (download, trim, cleanup) per clip
    assert "youtube.com/watch?v=abc123def45" in cmds[0]
    # trim covers the CSV segment [start, end], not a fixed 10 s
    assert "-ss 30.0" in cmds[1] and "-t 10.0" in cmds[1] and "-ar 32000" in cmds[1]
    assert cmds[2].startswith("rm -f ")  # raw download removed (dataset.py:133)
    assert "xyz987ghi65_0_10000.wav" in cmds[4]
    cmds1 = download_wavs(str(csv), str(tmp_path / "audio"), dry_run=True, mini_data=1)
    assert len(cmds1) == 3


def test_resnet_basic_block_matches_torch(rng):
    """2-D ResNet basic block with avg-pool downsample vs torch oracle
    (models.py:3246-3302)."""
    import torch
    import torch.nn.functional as TF

    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.models import pann_layers as P

    b, h, w, cin, cout = 2, 8, 8, 16, 32
    x = (rng.randn(b, h, w, cin) * 0.5).astype(np.float32)
    w1 = (rng.randn(cout, cin, 3, 3) * 0.1).astype(np.float32)
    w2 = (rng.randn(cout, cout, 3, 3) * 0.1).astype(np.float32)
    wd = (rng.randn(cout, cin, 1, 1) * 0.1).astype(np.float32)

    def make_bn(c):
        return {
            "scale": (rng.rand(c) + 0.5).astype(np.float32),
            "bias": rng.randn(c).astype(np.float32),
            "mean": rng.randn(c).astype(np.float32),
            "var": (rng.rand(c) + 0.5).astype(np.float32),
        }

    bn1, bn2, bnd = make_bn(cout), make_bn(cout), make_bn(cout)

    def t_bn(t, p):
        return TF.batch_norm(t, torch.from_numpy(p["mean"]), torch.from_numpy(p["var"]),
                             torch.from_numpy(p["scale"]), torch.from_numpy(p["bias"]),
                             training=False)

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        out = TF.avg_pool2d(xt, 2)  # stride-2 block
        out = torch.relu(t_bn(TF.conv2d(out, torch.from_numpy(w1), padding=1), bn1))
        out = t_bn(TF.conv2d(out, torch.from_numpy(w2), padding=1), bn2)
        identity = t_bn(TF.conv2d(TF.avg_pool2d(xt, 2), torch.from_numpy(wd)), bnd)
        ref = torch.relu(out + identity).numpy().transpose(0, 2, 3, 1)

    params = {
        "conv1": {"w": jnp.asarray(np.transpose(w1, (2, 3, 1, 0)))},
        "bn1": {k: jnp.asarray(v) for k, v in bn1.items()},
        "conv2": {"w": jnp.asarray(np.transpose(w2, (2, 3, 1, 0)))},
        "bn2": {k: jnp.asarray(v) for k, v in bn2.items()},
        "downsample": {
            "conv": {"w": jnp.asarray(np.transpose(wd, (2, 3, 1, 0)))},
            "bn": {k: jnp.asarray(v) for k, v in bnd.items()},
        },
    }
    bnctx = P.BnCtx(train=False)
    out = P.resnet_basic_block(jnp.asarray(x), params, bnctx, "blk", stride=2, drop_key=None)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4)


def test_full_samples_per_class_table():
    from audioset_convnext_inf_tpu.labels import full_samples_per_class

    t = full_samples_per_class()
    assert t.shape == (527,)
    # spot values from reference utils/config.py:35
    assert t[0] == 937432 and t[1] == 16344 and t[526] == 289
    assert int(t.sum()) == 3826593


def test_converter_validates_mel_weights():
    import pytest as _pytest

    from audioset_convnext_inf_tpu.checkpoint.convert import _validate_mel_weights
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.ops.frontend import mel_filterbank

    cfg = ConvNeXtConfig()
    f = cfg.frontend
    good = mel_filterbank(f.sample_rate, f.n_fft, f.n_mels, f.fmin, f.fmax).T
    _validate_mel_weights(good, cfg)  # matching matrix passes
    with _pytest.raises(ValueError, match="different STFT/mel"):
        _validate_mel_weights(np.zeros((10, 10), np.float32), cfg)  # shape
    bad = mel_filterbank(f.sample_rate, f.n_fft, f.n_mels, 0.0, 8000.0).T
    with _pytest.raises(ValueError, match="deviates"):
        _validate_mel_weights(bad, cfg)  # different fmin/fmax


def test_profile_ops_cpu_smoke():
    """profile_ops returns a per-op table (CPU trace has host events only;
    the TPU path is exercised by ad-hoc drives - NOTES.md round 2)."""
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.profiling import profile_ops

    rows = profile_ops(lambda x: (x @ x).sum(), jnp.ones((64, 64)), iters=2,
                       log_dir="/tmp/jax-op-profile-test")
    assert isinstance(rows, list)
    for r in rows:
        assert {"name", "category", "ms_per_iter"} <= set(r)
