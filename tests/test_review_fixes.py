"""Regression tests for code-review findings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_bn0_scale_trains(rng):
    """bn0's affine params must receive optimizer updates (they were being
    clobbered with pre-step values by the running-stat merge)."""
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    scale0 = np.asarray(params["bn0"]["scale"]).copy()
    tr = Trainer(cfg, TrainConfig(max_lr=1e-2, total_steps=100), params)
    wav = (rng.randn(8, 32000) * 0.1).astype(np.float32)
    tgt = np.zeros((8, 527), np.float32)
    tgt[:, 0] = 1
    for _ in range(3):
        tr.step(wav, tgt)
    assert not np.allclose(np.asarray(tr.state.params["bn0"]["scale"]), scale0)
    # running stats still update
    assert not np.allclose(np.asarray(tr.state.params["bn0"]["mean"]), 0.0)


def test_url_checkpoint_path_reachable(monkeypatch, tmp_path):
    """https URLs must reach the download branch, not FileNotFoundError."""
    from audioset_convnext_inf_tpu.checkpoint.io import _resolve_checkpoint_path

    calls = {}

    def fake_retrieve(url, dst):
        calls["url"] = url
        open(dst, "wb").write(b"x")

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_retrieve)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    out = _resolve_checkpoint_path("https://zenodo.org/record/123/convnext_tiny_471mAP.pth?download=1")
    assert calls["url"].startswith("https://zenodo.org")
    assert out.endswith("convnext_tiny_471mAP.pth")
    # genuinely-missing local paths still raise clearly
    with pytest.raises(FileNotFoundError):
        _resolve_checkpoint_path("/nonexistent/x.pth")


def test_dainet_pooling_matches_reference_shapes(rng):
    """DaiNet19 pools (k=4, pad=0) after blocks 1-3 only (models.py forward)."""
    from audioset_convnext_inf_tpu.models.pann import create_pann_model

    model = create_pann_model("DaiNet19", seed=0)
    x = (rng.randn(1, 64000) * 0.1).astype(np.float32)
    out = model.forward(x)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
    # conv0 stride 4 -> 16000; three pools of 4 (pad 0) -> 4000, 1000, 250
    # (no pool after block 4). Verify via the embedding path shape by probing
    # the time reduction: reference keeps 250 frames entering the head.


def test_slurm_head_node_parsing():
    from audioset_convnext_inf_tpu.parallel.dist import _slurm_head_node

    assert _slurm_head_node("tpu-vm-3") == "tpu-vm-3"
    assert _slurm_head_node("node[001-004]") == "node001"
    assert _slurm_head_node("gpu-a[01-04,07]") == "gpu-a01"
    assert _slurm_head_node("hosta,hostb") == "hosta"


def test_normalize_pcm_dtypes():
    from audioset_convnext_inf_tpu.data.audio_io import normalize_pcm

    x16 = np.array([0, 16384, -32768], np.int16)
    np.testing.assert_allclose(normalize_pcm(x16), [0.0, 0.5, -1.0], atol=1e-6)
    x32 = np.array([0, 2**30, -(2**31)], np.int32)
    np.testing.assert_allclose(normalize_pcm(x32), [0.0, 0.5, -1.0], atol=1e-6)
    x8 = np.array([128, 192, 0], np.uint8)
    np.testing.assert_allclose(normalize_pcm(x8), [0.0, 0.5, -1.0], atol=1e-6)
    stereo = np.array([[1.0, 3.0]], np.float32)
    np.testing.assert_allclose(normalize_pcm(stereo), [2.0])


def test_frontend_respects_center(rng):
    """center=False framing (no reflect pad) yields fewer frames."""
    from audioset_convnext_inf_tpu.config import FrontendConfig
    from audioset_convnext_inf_tpu.ops.frontend import log_mel_spectrogram

    x = (rng.randn(1, 32000) * 0.1).astype(np.float32)
    cfg_nc = FrontendConfig(center=False)
    cfg_c = FrontendConfig()
    nc = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg_nc))
    c = np.asarray(log_mel_spectrogram(jnp.asarray(x), cfg_c))
    assert nc.shape[2] == cfg_nc.num_frames(32000)
    assert c.shape[2] == cfg_c.num_frames(32000)
    assert nc.shape[2] < c.shape[2]


def test_hf_model_id_reaches_hub(monkeypatch, tmp_path):
    """Namespaced HuggingFace ids ('org/name', the documented reference
    usage, convnext.py:404-511) must route to hf_hub_download - they are
    not missing local paths despite containing a separator."""
    from audioset_convnext_inf_tpu.checkpoint.io import _resolve_checkpoint_path

    calls = []

    def fake_hub(model_id, filename, repo_type=None, revision=None,
                 library_name=None):
        calls.append((model_id, filename, revision))
        p = tmp_path / filename
        p.write_bytes(b"x")
        return str(p)

    import huggingface_hub

    monkeypatch.setattr(huggingface_hub, "hf_hub_download", fake_hub)
    out = _resolve_checkpoint_path("topel/ConvNeXt-Tiny-AT")
    assert calls[0] == ("topel/ConvNeXt-Tiny-AT", "model.safetensors", None)
    assert out.endswith("model.safetensors")
    out = _resolve_checkpoint_path("topel/ConvNeXt-Tiny-AT@v2")
    assert calls[-2][2] == "v2"  # [-1] is the courtesy config.yaml download
    # explicit paths still fail fast rather than hitting the hub
    for bad in ("/nonexistent/x.pth", "./missing/model.safetensors",
                "missing_dir/sub/model", "missing.pth"):
        with pytest.raises(FileNotFoundError):
            _resolve_checkpoint_path(bad)


def test_url_download_is_atomic(monkeypatch, tmp_path):
    """An interrupted checkpoint download must not poison the cache: the
    partial file is left under a temp name and the next call retries."""
    from audioset_convnext_inf_tpu.checkpoint.io import _resolve_checkpoint_path

    import urllib.request

    state = {"n": 0}

    def flaky_retrieve(url, dst):
        state["n"] += 1
        with open(dst, "wb") as f:
            f.write(b"partial")
        if state["n"] == 1:
            raise OSError("connection dropped")
        with open(dst, "wb") as f:
            f.write(b"complete checkpoint bytes")

    monkeypatch.setattr(urllib.request, "urlretrieve", flaky_retrieve)
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    url = "https://zenodo.org/record/9/ckpt.pth"
    with pytest.raises(OSError):
        _resolve_checkpoint_path(url)
    # the failed attempt must not have installed a cache entry
    out = _resolve_checkpoint_path(url)
    assert open(out, "rb").read() == b"complete checkpoint bytes"
    assert state["n"] == 2
