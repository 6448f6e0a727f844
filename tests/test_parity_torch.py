"""Numerical parity of the full JAX trunk against the torch oracle.

The oracle is a fresh, compact torch implementation of the reference
semantics (tests/torch_oracle.py). Weights flow through our converter
(jax -> torch state dict), so these tests simultaneously validate the
converter's key/layout mapping and the forward math.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import ConvNeXtConfig, FrontendConfig
from audioset_convnext_inf_tpu.checkpoint.convert import (
    jax_params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from audioset_convnext_inf_tpu.models import convnext as F
from audioset_convnext_inf_tpu.ops.frontend import mel_filterbank

from tests.torch_oracle import OracleConvNeXt, oracle_logmel


def _small_cfg():
    # 2-deep stages keep the oracle comparison fast but cover every layer type
    return ConvNeXtConfig(
        name="parity_small",
        depths=(1, 1, 2, 1),
        dims=(32, 64, 128, 256),
        drop_path_rate=0.0,
    )


def _randomized_torch_oracle(cfg, seed=0):
    torch.manual_seed(seed)
    model = OracleConvNeXt(
        depths=cfg.depths,
        dims=cfg.dims,
        num_classes=cfg.num_classes,
        stem_kernel=cfg.stem_geometry()[0],
        stem_stride=cfg.stem_geometry()[1],
        stem_pad=cfg.stem_geometry()[2],
        n_mels=cfg.frontend.n_mels,
    )
    # randomize parameters incl. bn0 running stats to make the test non-trivial
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.05 * torch.randn_like(p))
        model.bn0.running_mean.normal_(0, 1.0)
        model.bn0.running_var.uniform_(0.5, 2.0)
    model.eval()
    return model


@pytest.fixture(scope="module")
def parity_setup():
    cfg = _small_cfg()
    oracle = _randomized_torch_oracle(cfg)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = torch_state_dict_to_params(sd, cfg)
    return cfg, oracle, params


def test_trunk_logits_match_oracle(parity_setup, rng):
    cfg, oracle, params = parity_setup
    spec = rng.randn(2, 1, 41, 224).astype(np.float32)  # arbitrary T
    with torch.no_grad():
        ref = oracle(torch.from_numpy(spec))
    x_nhwc = jnp.asarray(np.transpose(spec, (0, 2, 3, 1)))
    ours = F.forward(params, x_nhwc, cfg)
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_logits"]), ref["clipwise_logits"].numpy(), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_output"]), ref["clipwise_output"].numpy(), atol=1e-5
    )


def test_scene_embeddings_match_oracle(parity_setup, rng):
    cfg, oracle, params = parity_setup
    spec = rng.randn(2, 1, 41, 224).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(spec))["embedding"]
    x_nhwc = jnp.asarray(np.transpose(spec, (0, 2, 3, 1)))
    # scene = forward_features on the bn0-normalized input; replicate prologue
    from audioset_convnext_inf_tpu.models.convnext import _frontend_and_bn0, forward_features

    x = _frontend_and_bn0(x_nhwc, params, cfg, None, False, None, None)
    emb = forward_features(x, params, cfg)
    np.testing.assert_allclose(np.asarray(emb), ref.numpy(), atol=2e-4)


def test_frame_embeddings_match_oracle(parity_setup, rng):
    cfg, oracle, params = parity_setup
    spec = rng.randn(1, 1, 41, 224).astype(np.float32)
    with torch.no_grad():
        x = torch.from_numpy(spec).transpose(1, 3)
        x = oracle.bn0(x)
        x = x.transpose(1, 3)
        ref = oracle.forward_features(x, return_frame_embeddings=True)
    from audioset_convnext_inf_tpu.models.convnext import _frontend_and_bn0, forward_features

    x_nhwc = jnp.asarray(np.transpose(spec, (0, 2, 3, 1)))
    xj = _frontend_and_bn0(x_nhwc, params, cfg, None, False, None, None)
    frames = forward_features(xj, params, cfg, return_frame_embeddings=True)
    frames_nchw = np.transpose(np.asarray(frames), (0, 3, 1, 2))
    np.testing.assert_allclose(frames_nchw, ref.numpy(), atol=2e-4)


def test_converter_roundtrip(parity_setup):
    cfg, _, params = parity_setup
    sd = jax_params_to_torch_state_dict(params, cfg)
    params2 = torch_state_dict_to_params(sd, cfg)
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert len(flat1) == len(flat2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_end_to_end_waveform_parity(rng):
    """Whole pipeline vs oracle: waveform -> logmel(frontend) -> trunk."""
    cfg = _small_cfg()
    oracle = _randomized_torch_oracle(cfg, seed=1)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    params = torch_state_dict_to_params(sd, cfg)

    wav = (rng.randn(2, 32000) * 0.1).astype(np.float32)
    mel_w = mel_filterbank(32000, 1024, 224, 50.0, 14000.0, dtype=np.float64)
    ref_spec = oracle_logmel(wav, mel_w)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(ref_spec))

    ours = F.forward(params, jnp.asarray(wav), cfg)
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_logits"]), ref["clipwise_logits"].numpy(), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(ours["clipwise_output"]), ref["clipwise_output"].numpy(), atol=1e-4
    )
