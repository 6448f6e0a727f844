"""Engine tests: metrics parity vs sklearn direct, sharded evaluator on the
8-device virtual mesh, long-audio windows, embedding extraction."""

import numpy as np
import pytest

import jax

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.data import AudioSetDataset, DataLoader, EvaluateSampler
from audioset_convnext_inf_tpu.engine import (
    Evaluator,
    evaluate_clipwise,
    sliding_windows,
    summarize,
    tag_long_audio,
)
from audioset_convnext_inf_tpu.models import convnext as F
from tests.make_synth_hdf5 import make_packed_and_index


def _tiny_cfg():
    return ConvNeXtConfig(name="tiny_test", depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                          drop_path_rate=0.0)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("engine_h5")
    return make_packed_and_index(str(d), n_clips=24, clip_samples=16000)


def test_metrics_match_sklearn(rng):
    from scipy.stats import norm
    from sklearn import metrics as skm

    n, c = 200, 8
    target = (rng.rand(n, c) > 0.7).astype(np.float32)
    target[0] = 1  # populate all classes both ways
    target[1] = 0
    probs = rng.rand(n, c)
    stats = evaluate_clipwise(probs, target)
    ap = skm.average_precision_score(target, probs, average=None)
    auc = skm.roc_auc_score(target, probs, average=None)
    np.testing.assert_allclose(stats["average_precision"], ap)
    np.testing.assert_allclose(stats["auc"], auc)
    np.testing.assert_allclose(stats["d_prime"], np.sqrt(2) * norm.ppf(auc))
    s = summarize(stats)
    assert 0 <= s["mAP"] <= 1 and 0 <= s["mAUC"] <= 1


def test_metrics_handle_empty_classes(rng):
    n, c = 50, 4
    target = np.zeros((n, c), np.float32)
    target[:, 0] = rng.rand(n) > 0.5  # only class 0 populated
    probs = rng.rand(n, c)
    stats = evaluate_clipwise(probs, target)
    assert np.isfinite(stats["average_precision"][0])
    assert np.isnan(stats["average_precision"][1:]).all()
    assert np.isfinite(summarize(stats)["mAP"])


def test_metrics_all_positive_class_keeps_ap(rng):
    """A class positive in EVERY clip still has a defined AP (sklearn
    computes it; the reference would too) - only AUC needs a negative."""
    from sklearn import metrics as skm

    n, c = 40, 3
    target = np.zeros((n, c), np.float32)
    target[:, 0] = 1.0                     # all-positive
    target[:, 1] = rng.rand(n) > 0.5       # mixed
    probs = rng.rand(n, c)
    stats = evaluate_clipwise(probs, target)
    assert np.isfinite(stats["average_precision"][0])
    np.testing.assert_allclose(
        stats["average_precision"][0],
        skm.average_precision_score(target[:, 0], probs[:, 0]))
    assert np.isnan(stats["auc"][0])       # AUC undefined without negatives
    assert np.isfinite(stats["auc"][1])
    assert np.isnan(stats["average_precision"][2])  # no positives at all


def test_evaluator_sharded_over_virtual_mesh(synth):
    """End-to-end eval on 8 virtual CPU devices; padding + trimming correct."""
    _, index = synth
    assert len(jax.devices()) == 8
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    ev = Evaluator(params, cfg)
    loader = DataLoader(AudioSetDataset(), EvaluateSampler(index, batch_size=16),
                        num_workers=4, pad_to_batch_size=16)
    stats = ev.evaluate(loader)
    assert stats["average_precision"].shape == (527,)
    out = ev.infer_probs(
        DataLoader(AudioSetDataset(), EvaluateSampler(index, batch_size=16),
                   num_workers=4, pad_to_batch_size=16)
    )
    assert out["clipwise_output"].shape == (24, 527)
    assert out["target"].shape == (24, 527)


def test_evaluator_batch_invariance(synth):
    """Same probs regardless of batch size (padding must not leak)."""
    _, index = synth
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    ev = Evaluator(params, cfg)

    def probs_with_batch(bs):
        loader = DataLoader(AudioSetDataset(), EvaluateSampler(index, batch_size=bs),
                            num_workers=2, pad_to_batch_size=bs)
        return ev.infer_probs(loader)["clipwise_output"]

    p1 = probs_with_batch(16)
    p2 = probs_with_batch(8)
    np.testing.assert_allclose(p1, p2, atol=2e-5)


def test_evaluator_fbank_mode(synth):
    """Kaldi-fbank batches (use_torchaudio analog) evaluate end-to-end."""
    _, index = synth
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    ev = Evaluator(params, cfg)
    loader = DataLoader(AudioSetDataset(use_kaldi_fbank=True),
                        EvaluateSampler(index, batch_size=8),
                        num_workers=2, pad_to_batch_size=8)
    out = ev.infer_probs(loader)
    assert out["clipwise_output"].shape == (24, 527)
    assert np.isfinite(out["clipwise_output"]).all()


def test_sliding_windows():
    x = np.arange(250.0, dtype=np.float32)
    w, n = sliding_windows(x, window_samples=100, hop_samples=50)
    assert n == 4  # covers 0-100, 50-150, 100-200, 150-250
    assert w.shape == (4, 100)
    np.testing.assert_array_equal(w[0], x[:100])
    np.testing.assert_array_equal(w[3], x[150:250])
    # short audio: single zero-padded window
    w, n = sliding_windows(np.ones(30, np.float32), 100)
    assert n == 1 and w.shape == (1, 100) and w[0, 30:].sum() == 0
    # int16 PCM stays int16 (rides the on-device /32767 decode); casting
    # to float32 here without the scale fed the model audio 32767x too
    # large (round-4 advisor finding)
    xi = (np.arange(250) - 125).astype(np.int16)
    wi, ni = sliding_windows(xi, window_samples=100, hop_samples=50)
    assert wi.dtype == np.int16 and ni == 4
    np.testing.assert_array_equal(wi[0], xi[:100])
    # float64 / int32 inputs still convert to float32
    assert sliding_windows(np.ones(30, np.float64), 100)[0].dtype == np.float32


class _FakeModel:
    def forward(self, batch):
        import jax.numpy as jnp

        b = batch.shape[0]
        # prob = mean(|x|) per clip, broadcast over 527
        p = np.abs(np.asarray(batch)).mean(axis=1, keepdims=True) * np.ones((b, 527))
        return {"clipwise_output": p, "clipwise_logits": p}

    def forward_frame_embeddings(self, batch):
        m = np.abs(np.asarray(batch)).mean(axis=1)  # (B,)
        return m[:, None, None, None] * np.ones((len(m), 8, 31, 7), np.float32)

    def forward_scene_embeddings(self, batch):
        m = np.abs(np.asarray(batch)).mean(axis=1)
        return m[:, None] * np.ones((len(m), 8), np.float32)


def test_tag_long_audio_reduces_over_windows():
    model = _FakeModel()
    audio = np.concatenate([np.zeros(320000, np.float32), np.ones(320000, np.float32)])
    out = tag_long_audio(model, audio, batch_size=4)
    assert out["windowwise_output"].shape == (2, 527)
    np.testing.assert_allclose(out["clipwise_output"], out["windowwise_output"].max(0))
    assert out["clipwise_output"][0] > 0.9


def test_embed_long_audio_stitches_time_axis():
    from audioset_convnext_inf_tpu.engine.infer import embed_long_audio

    model = _FakeModel()
    # 3 windows with distinct mean levels 0 / 1 / 0.5 (tail zero-padded)
    audio = np.concatenate([
        np.zeros(320000, np.float32),
        np.ones(320000, np.float32),
        np.ones(160000, np.float32),
    ])
    out = embed_long_audio(model, audio, batch_size=2)  # forces 2 chunks
    assert out["frame_embeddings"].shape == (8, 31 * 3, 7)
    assert out["windowwise_scene"].shape == (3, 8)
    # time-axis stitch preserves window order (levels 0, 1, then tail 0.5)
    levels = out["frame_embeddings"][0, ::31, 0]
    np.testing.assert_allclose(levels, [0.0, 1.0, 0.5])
    np.testing.assert_allclose(out["scene_embedding"],
                               out["windowwise_scene"].mean(0))


def test_loss_registry_contract(rng):
    """Every registered loss satisfies loss_fn(output_dict, target_dict) -
    the engine contract (the reference registry returns F1_loss_objective
    with a raw-array signature that cannot plug into its own loop)."""
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.engine.losses import get_loss_func

    out = {"clipwise_output": jnp.asarray(rng.rand(8, 527).astype(np.float32)),
           "clipwise_logits": jnp.asarray(rng.randn(8, 527).astype(np.float32))}
    tgt = {"target": jnp.asarray((rng.rand(8, 527) > 0.97).astype(np.float32))}
    for name in ("clip_bce", "f1micro", "f1macro", "set_acc"):
        loss = float(get_loss_func(name)(out, tgt))
        assert np.isfinite(loss), name
    with pytest.raises(ValueError):
        get_loss_func("nope")
