"""PANN zoo tests: every registry model builds and forwards; Cnn14 matches a
torch oracle through the rule-based checkpoint converter; SED heads emit
framewise output."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.models.pann import (
    PANN_REGISTRY,
    PannModel,
    create_pann_model,
)


_WAVE_MODELS = {"LeeNet11", "LeeNet24", "DaiNet19", "Res1dNet31", "Res1dNet51",
                "Wavegram_Cnn14", "Wavegram_Logmel_Cnn14", "Wavegram_Logmel128_Cnn14"}


def _clip_len(name):
    if name == "Cnn14_16k":
        return 16000
    if name == "Cnn14_8k":
        return 8000
    return 32000


@pytest.mark.parametrize("name", sorted(PANN_REGISTRY))
def test_zoo_model_forward(name, rng):
    model = create_pann_model(name, seed=0)
    x = (rng.randn(1, _clip_len(name)) * 0.1).astype(np.float32)
    out = model.forward(x)
    assert out["clipwise_output"].shape == (1, 527), name
    probs = np.asarray(out["clipwise_output"])
    assert np.isfinite(probs).all() and (probs >= 0).all() and (probs <= 1).all(), name
    if "DecisionLevel" in name:
        assert "framewise_output" in out and "segmentwise_output" in out
        assert out["framewise_output"].shape[0] == 1
        assert out["framewise_output"].shape[2] == 527
    else:
        assert "embedding" in out


def test_sed_framewise_length(rng):
    model = create_pann_model("Cnn14_DecisionLevelMax", seed=0)
    x = (rng.randn(1, 32000) * 0.1).astype(np.float32)
    out = model.forward(x)
    frames = model.frontend.cfg.num_frames(32000)
    assert out["framewise_output"].shape == (1, frames, 527)
    # clipwise = max over segments
    np.testing.assert_allclose(
        np.asarray(out["clipwise_output"]),
        np.asarray(out["segmentwise_output"]).max(axis=1),
        atol=1e-6,
    )


def test_train_forward_with_specaug_and_dropout(rng):
    model = create_pann_model("Cnn6", seed=0)
    x = jnp.asarray((rng.randn(2, 32000) * 0.1).astype(np.float32))
    out = model.forward_train(x, train_key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
    assert out["bn_updates"]  # running stats were collected


class TorchCnn14Oracle:
    """Compact torch oracle of Cnn14's trunk+head (frontend fed externally)."""

    def __init__(self, seed=0):
        import torch
        import torch.nn as nn

        torch.manual_seed(seed)

        class ConvBlock(nn.Module):
            def __init__(self, i, o):
                super().__init__()
                self.conv1 = nn.Conv2d(i, o, 3, 1, 1, bias=False)
                self.conv2 = nn.Conv2d(o, o, 3, 1, 1, bias=False)
                self.bn1 = nn.BatchNorm2d(o)
                self.bn2 = nn.BatchNorm2d(o)

            def forward(self, x, pool):
                import torch.nn.functional as F

                x = F.relu(self.bn1(self.conv1(x)))
                x = F.relu(self.bn2(self.conv2(x)))
                if pool != (1, 1):
                    x = F.avg_pool2d(x, pool)
                return x

        class Net(nn.Module):
            def __init__(self):
                super().__init__()
                self.bn0 = nn.BatchNorm2d(64)
                chans = [1, 64, 128, 256, 512, 1024, 2048]
                for i in range(6):
                    setattr(self, f"conv_block{i + 1}", ConvBlock(chans[i], chans[i + 1]))
                self.fc1 = nn.Linear(2048, 2048)
                self.fc_audioset = nn.Linear(2048, 527)

            def forward(self, spec):
                import torch
                import torch.nn.functional as F

                x = spec.transpose(1, 3)
                x = self.bn0(x)
                x = x.transpose(1, 3)
                for i in range(6):
                    pool = (2, 2) if i < 5 else (1, 1)
                    x = getattr(self, f"conv_block{i + 1}")(x, pool)
                x = torch.mean(x, dim=3)
                x = torch.max(x, dim=2)[0] + torch.mean(x, dim=2)
                x = F.relu(self.fc1(x))
                logits = self.fc_audioset(x)
                return torch.sigmoid(logits), logits

        self.net = Net().eval()
        with __import__("torch").no_grad():
            for p in self.net.parameters():
                p.add_(0.02 * __import__("torch").randn_like(p))
            self.net.bn0.running_mean.normal_(0, 0.5)
            self.net.bn0.running_var.uniform_(0.5, 2.0)


def test_cnn14_matches_torch_oracle_via_converter(rng):
    import torch

    from audioset_convnext_inf_tpu.checkpoint.pann_convert import pann_state_dict_to_params
    from audioset_convnext_inf_tpu.models.pann import PANN_REGISTRY, apply_cnn, _Ctx
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    oracle = TorchCnn14Oracle(seed=3)
    sd = {k: v for k, v in oracle.net.state_dict().items()}
    cfg = PANN_REGISTRY["Cnn14"]
    params = pann_state_dict_to_params(sd, cfg)

    # feed the same log-mel image to both (frontend validated elsewhere)
    spec = (rng.randn(2, 1, 96, 64) * 2.0 - 30).astype(np.float32)
    with torch.no_grad():
        ref_probs, ref_logits = oracle.net(torch.from_numpy(spec))

    model = PannModel(cfg, params)
    # bypass the frontend: call the internals with the spectrogram injected
    frontend = model.frontend

    class FakeFrontend:
        cfg = frontend.cfg

        def __call__(self, w):
            return jnp.asarray(spec)

    from audioset_convnext_inf_tpu.models import pann as pann_mod

    out = pann_mod.apply_cnn(params, jnp.zeros((2, 32000)), cfg, FakeFrontend())
    np.testing.assert_allclose(
        np.asarray(out["clipwise_logits"]), ref_logits.numpy(), atol=3e-4
    )


def test_sed_plot_figure(tmp_path, rng):
    """The --plot SED figure (reference inference.py:172-196) renders and
    saves a non-empty png headlessly."""
    from audioset_convnext_inf_tpu.cli.inference import plot_sed
    from audioset_convnext_inf_tpu.config import FrontendConfig
    from audioset_convnext_inf_tpu.labels import read_audioset_label_tags

    wav = (rng.randn(32000) * 0.1).astype(np.float32)
    framewise = rng.rand(101, 527).astype(np.float32)
    top = np.argsort(framewise.max(axis=0))[::-1][:10]
    out = str(tmp_path / "sed.png")
    plot_sed(wav, framewise, top, read_audioset_label_tags(),
             FrontendConfig(), out)
    import os
    assert os.path.getsize(out) > 10000
