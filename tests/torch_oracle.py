"""Test-only torch oracle of the reference ConvNeXt semantics.

A compact, independently written torch implementation used purely as a
numerical oracle in parity tests (the reference's torchlibrosa dependency is
unavailable, so the frontend oracle uses torch.stft with the documented
parameters: Hann periodic window, center=True, reflect pad, power spectrum -
the same math torchlibrosa computes via conv1d).

This mirrors the reference *semantics* (convnext.py:44-331) so that the JAX
implementation can be validated layer by layer against torch's kernels.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF


class OracleLayerNorm(nn.Module):
    def __init__(self, dim, eps=1e-6, channels_first=False):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps
        self.channels_first = channels_first

    def forward(self, x):
        if not self.channels_first:
            return TF.layer_norm(x, self.weight.shape, self.weight, self.bias, self.eps)
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class OracleBlock(nn.Module):
    def __init__(self, dim, layer_scale_init_value=1e-6):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, kernel_size=7, padding=3, groups=dim)
        self.norm = OracleLayerNorm(dim)
        self.pwconv1 = nn.Linear(dim, 4 * dim)
        self.act = nn.GELU()
        self.pwconv2 = nn.Linear(4 * dim, dim)
        self.gamma = nn.Parameter(layer_scale_init_value * torch.ones(dim))

    def forward(self, x):
        inp = x
        x = self.dwconv(x)
        x = x.permute(0, 2, 3, 1)
        x = self.pwconv2(self.act(self.pwconv1(self.norm(x))))
        x = self.gamma * x
        x = x.permute(0, 3, 1, 2)
        return inp + x


class OracleConvNeXt(nn.Module):
    """Eval-mode reference trunk: bn0 + stem + stages + pooling + head."""

    def __init__(self, depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), num_classes=527,
                 stem_kernel=(4, 4), stem_stride=(4, 4), stem_pad=(4, 0), n_mels=224):
        super().__init__()
        self.bn0 = nn.BatchNorm2d(n_mels)
        self.downsample_layers = nn.ModuleList()
        stem = nn.Sequential(
            nn.Conv2d(1, dims[0], kernel_size=stem_kernel, stride=stem_stride, padding=stem_pad),
            OracleLayerNorm(dims[0], channels_first=True),
        )
        self.downsample_layers.append(stem)
        for i in range(3):
            self.downsample_layers.append(
                nn.Sequential(
                    OracleLayerNorm(dims[i], channels_first=True),
                    nn.Conv2d(dims[i], dims[i + 1], kernel_size=2, stride=2),
                )
            )
        self.stages = nn.ModuleList(
            nn.Sequential(*[OracleBlock(dims[i]) for _ in range(depths[i])]) for i in range(4)
        )
        self.norm = nn.LayerNorm(dims[-1], eps=1e-6)
        self.head_audioset = nn.Linear(dims[-1], num_classes)

    def forward_features(self, x, return_frame_embeddings=False):
        for i in range(4):
            x = self.downsample_layers[i](x)
            x = self.stages[i](x)
        if return_frame_embeddings:
            return x
        x = torch.mean(x, dim=3)
        x1, _ = torch.max(x, dim=2)
        x2 = torch.mean(x, dim=2)
        return self.norm(x1 + x2)

    def forward(self, spec):
        """spec: (B, 1, T, M) log-mel image (frontend applied externally)."""
        x = spec.transpose(1, 3)
        x = self.bn0(x)
        x = x.transpose(1, 3)
        emb = self.forward_features(x)
        logits = self.head_audioset(emb)
        return {"clipwise_logits": logits, "clipwise_output": torch.sigmoid(logits),
                "embedding": emb}


def oracle_logmel(waveform: np.ndarray, mel_weights: np.ndarray,
                  n_fft=1024, hop=320, amin=1e-10) -> np.ndarray:
    """torch.stft-based log-mel with torchlibrosa conventions.

    waveform: (B, N) float32. mel_weights: (n_mels, n_fft//2+1).
    Returns (B, 1, T, n_mels) float32.
    """
    x = torch.from_numpy(waveform)
    window = torch.hann_window(n_fft, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        x.double(), n_fft=n_fft, hop_length=hop, win_length=n_fft,
        window=window, center=True, pad_mode="reflect", return_complex=True,
    )  # (B, F, T)
    power = spec.real ** 2 + spec.imag ** 2
    mel = torch.einsum("bft,mf->btm", power, torch.from_numpy(mel_weights).double())
    logmel = 10.0 * torch.log10(torch.clamp(mel, min=amin))
    return logmel.unsqueeze(1).float().numpy()
