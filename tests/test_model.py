"""Model structure tests: parameter counts, shapes, stem geometry, factories."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.models import (
    MODEL_REGISTRY,
    convnext_tiny,
    create_model,
)
from audioset_convnext_inf_tpu.models import convnext as F


def test_tiny_param_count_matches_reference():
    # reference README.md:49 / scripts/demo_convnext.sbatch.output:3
    m = convnext_tiny(drop_path_rate=0.0, seed=0)
    assert m.count_parameters() == 28_222_767


def test_output_shapes_match_golden():
    m = convnext_tiny(drop_path_rate=0.0, seed=0)
    x = np.zeros((1, 320000), np.float32)
    out = m.forward(x)
    assert out["clipwise_logits"].shape == (1, 527)
    assert out["clipwise_output"].shape == (1, 527)
    assert m.forward_scene_embeddings(x).shape == (1, 768)
    # golden frame embedding shape (1, 768, 31, 7): demo_convnext.sbatch.output
    assert m.forward_frame_embeddings(x).shape == (1, 768, 31, 7)


def test_probs_are_sigmoid_of_logits():
    m = convnext_tiny(drop_path_rate=0.0, seed=0)
    x = np.random.RandomState(0).randn(1, 32000).astype(np.float32) * 0.1
    out = m.forward(x)
    np.testing.assert_allclose(
        np.asarray(out["clipwise_output"]),
        1.0 / (1.0 + np.exp(-np.asarray(out["clipwise_logits"]))),
        atol=1e-6,
    )


@pytest.mark.parametrize(
    "after_stem_dim,expected_hw",
    [((252, 56), (252, 56)), ((504, 28), (504, 28)), ((504, 56), (504, 56)),
     ((56,), (56, 56)), ((112,), (112, 112))],
)
def test_stem_geometry_output_dims(after_stem_dim, expected_hw):
    """Audio stems must reproduce the reference's post-stem spatial dims
    on a 1001x224 spectrogram (reference convnext.py:674-707)."""
    from audioset_convnext_inf_tpu.models import layers as L

    cfg = ConvNeXtConfig(after_stem_dim=after_stem_dim)
    (kh, kw), stride, pad = cfg.stem_geometry()
    x = jnp.zeros((1, 1001, 224, 1))
    w = jnp.zeros((kh, kw, 1, 96))
    y = L.conv2d(x, w, stride=stride, padding=pad)
    assert y.shape[1:3] == expected_hw


def test_all_factories_build():
    for name in MODEL_REGISTRY:
        m = create_model(name, drop_path_rate=0.0, seed=0)
        assert m.count_parameters() > 0, name


@pytest.mark.parametrize("name", ["convnext_atto", "convnext_nano"])
def test_small_factories_forward(name):
    # forward the small variants only: compiling all 7 trunks on CPU is slow
    x = np.zeros((1, 32000), np.float32)
    m = create_model(name, drop_path_rate=0.0, seed=0)
    out = m.forward(x)
    assert out["clipwise_logits"].shape == (1, 527), name


def test_train_forward_runs_with_augment():
    cfg = ConvNeXtConfig(drop_path_rate=0.1)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(4, 32000).astype(np.float32))
    out = F.forward(params, x, cfg, train_key=jax.random.PRNGKey(1))
    assert out["clipwise_logits"].shape == (4, 527)
    assert np.isfinite(np.asarray(out["clipwise_logits"])).all()


def test_mixup_halves_batch():
    from audioset_convnext_inf_tpu.ops.mixup import do_mixup, get_mixup_lambda

    lam = get_mixup_lambda(jax.random.PRNGKey(0), 8, alpha=1.0)
    assert lam.shape == (8,)
    np.testing.assert_allclose(np.asarray(lam[0::2] + lam[1::2]), 1.0, atol=1e-6)
    x = jnp.arange(8.0)[:, None] * jnp.ones((8, 3))
    mixed = do_mixup(x, lam)
    assert mixed.shape == (4, 3)


def test_batch_norm_train_forward_and_grad_vs_torch():
    """Op-level oracle for the bn0 train path: training-mode BatchNorm over
    the mel axis (batch statistics + running-stat update + backward through
    the batch-stat normalization) vs torch.nn.BatchNorm2d. Complements
    test_full_model_gradient_parity, which runs eval-mode bn0 only
    (reference train-mode forward can't be driven RNG-free)."""
    import torch

    from audioset_convnext_inf_tpu.models import layers as L

    rng = np.random.RandomState(4)
    b, t, m = 6, 20, 16
    x = (rng.randn(b, t, m) * 1.7 + 0.3).astype(np.float32)
    scale = (1.0 + 0.1 * rng.randn(m)).astype(np.float32)
    bias = (0.1 * rng.randn(m)).astype(np.float32)
    run_mean = rng.randn(m).astype(np.float32)
    run_var = (0.5 + rng.rand(m)).astype(np.float32)
    r = rng.randn(b, t, m).astype(np.float32)  # cotangent seed

    # torch: BatchNorm2d over channels = mel, via the reference's transpose
    # trick (convnext.py:304-306) on a (B, 1, T, M) image
    bn = torch.nn.BatchNorm2d(m, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(scale))
        bn.bias.copy_(torch.from_numpy(bias))
        bn.running_mean.copy_(torch.from_numpy(run_mean))
        bn.running_var.copy_(torch.from_numpy(run_var))
    bn.train()
    xt = torch.from_numpy(x[:, None, :, :]).requires_grad_(True)
    yt = bn(xt.transpose(1, 3)).transpose(1, 3)
    (yt.squeeze(1) * torch.from_numpy(r)).sum().backward()

    params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias),
              "mean": jnp.asarray(run_mean), "var": jnp.asarray(run_var)}

    def f(p, x):
        y, new_stats = L.batch_norm_train(x, p, eps=1e-5, axis=-1)
        return jnp.sum(y * jnp.asarray(r)), new_stats

    (val, new_stats), grads = jax.value_and_grad(f, argnums=(0, 1), has_aux=True)(
        params, jnp.asarray(x)
    )
    y_ours, _ = L.batch_norm_train(jnp.asarray(x), params, eps=1e-5, axis=-1)

    np.testing.assert_allclose(np.asarray(y_ours), yt.detach().numpy().squeeze(1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_stats["mean"]),
                               bn.running_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_stats["var"]),
                               bn.running_var.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(grads[1]),
                               xt.grad.numpy().squeeze(1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[0]["scale"]),
                               bn.weight.grad.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(grads[0]["bias"]),
                               bn.bias.grad.numpy(), atol=1e-4)


def test_int16_forward_decodes_on_device():
    """model.forward(int16 PCM) must equal forward(float32 pcm/32767): the
    decode happens inside the jitted program (api.py _with_pcm_decode),
    halving host->device bytes on the serving path."""
    m = convnext_tiny(drop_path_rate=0.0, seed=0)
    pcm = (np.random.RandomState(0).randn(1, 32000) * 8000).astype(np.int16)
    out16 = np.asarray(m.forward(pcm)["clipwise_logits"])
    out32 = np.asarray(
        m.forward(pcm.astype(np.float32) * (1.0 / 32767.0))["clipwise_logits"])
    np.testing.assert_allclose(out16, out32, atol=1e-5)
    emb16 = np.asarray(m.forward_scene_embeddings(pcm))
    emb32 = np.asarray(
        m.forward_scene_embeddings(pcm.astype(np.float32) * (1.0 / 32767.0)))
    np.testing.assert_allclose(emb16, emb32, atol=1e-4)
