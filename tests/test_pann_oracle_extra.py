"""Extra torch-oracle parity: AttBlock pooling and ConvBlock5x5 chain."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.models import pann_layers as P


def test_att_block_matches_torch(rng):
    """Clamped-softmax attention pooling (models.py AttBlock:2059-2088)."""
    n_in, n_out, t, b = 32, 7, 19, 3
    x = rng.randn(b, t, n_in).astype(np.float32)

    att_w = rng.randn(n_out, n_in, 1).astype(np.float32) * 0.5
    att_b = rng.randn(n_out).astype(np.float32)
    cla_w = rng.randn(n_out, n_in, 1).astype(np.float32) * 0.5
    cla_b = rng.randn(n_out).astype(np.float32)

    # torch reference: x (B, C, T) conv1d
    xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
    att = torch.nn.functional.conv1d(xt, torch.from_numpy(att_w), torch.from_numpy(att_b))
    norm_att = torch.softmax(torch.clamp(att, -10, 10), dim=-1)
    cla = torch.sigmoid(
        torch.nn.functional.conv1d(xt, torch.from_numpy(cla_w), torch.from_numpy(cla_b))
    )
    ref_clip = torch.sum(norm_att * cla, dim=2).numpy()

    params = {
        "att": {"w": jnp.asarray(np.transpose(att_w, (2, 1, 0))), "b": jnp.asarray(att_b)},
        "cla": {"w": jnp.asarray(np.transpose(cla_w, (2, 1, 0))), "b": jnp.asarray(cla_b)},
    }
    clip, norm, cla_j = P.att_block(jnp.asarray(x), params, activation="sigmoid")
    np.testing.assert_allclose(np.asarray(clip), ref_clip, atol=1e-5)


def test_conv_block5x5_matches_torch(rng):
    """5x5 conv + BN(eval) + ReLU + avg pool (models.py:1977-2020)."""
    b, h, w, cin, cout = 2, 12, 16, 3, 8
    x = rng.randn(b, h, w, cin).astype(np.float32)
    wgt = (rng.randn(cout, cin, 5, 5) * 0.2).astype(np.float32)
    bn_scale = (rng.rand(cout) + 0.5).astype(np.float32)
    bn_bias = rng.randn(cout).astype(np.float32)
    bn_mean = rng.randn(cout).astype(np.float32)
    bn_var = (rng.rand(cout) + 0.5).astype(np.float32)

    conv = torch.nn.Conv2d(cin, cout, 5, padding=2, bias=False)
    conv.weight.data = torch.from_numpy(wgt)
    bn = torch.nn.BatchNorm2d(cout).eval()
    bn.weight.data = torch.from_numpy(bn_scale)
    bn.bias.data = torch.from_numpy(bn_bias)
    bn.running_mean.data = torch.from_numpy(bn_mean)
    bn.running_var.data = torch.from_numpy(bn_var)
    with torch.no_grad():
        t = torch.relu(bn(conv(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))))
        ref = torch.nn.functional.avg_pool2d(t, (2, 2)).numpy().transpose(0, 2, 3, 1)

    params = {
        "conv1": {"w": jnp.asarray(np.transpose(wgt, (2, 3, 1, 0)))},
        "bn1": {"scale": jnp.asarray(bn_scale), "bias": jnp.asarray(bn_bias),
                "mean": jnp.asarray(bn_mean), "var": jnp.asarray(bn_var)},
    }
    bnctx = P.BnCtx(train=False)
    out = P.conv_block5x5(jnp.asarray(x), params, bnctx, "b", (2, 2), "avg")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
