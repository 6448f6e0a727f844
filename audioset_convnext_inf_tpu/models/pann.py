"""TPU-native PANN legacy model zoo (reference pytorch/models.py, 72 classes).

The reference defines each model as a standalone ~100-line class; here the
zoo is config-driven: one functional builder per *family*, with the
reference's per-class differences (channel ladders, frontend parameters,
embedding sizes, pooling heads) expressed as :class:`PannConfig` presets in
``PANN_REGISTRY``. All share the reference skeleton (e.g. models.py
Cnn14:2090-2178): log-mel frontend -> bn0 over the mel axis -> trunk ->
freq-mean + time-(max+mean) pooling -> fc1 -> 527-way sigmoid head, returning
{'clipwise_output', 'embedding'} (+ 'framewise_output'/'segmentwise_output'
for the SED decision-level heads, models.py:5678-5982).

The registry covers all 49 runnable reference models, including the 16
Cnn*Next ablation hybrids and the Deformable variants (torchvision's
``deform_conv2d`` rebuilt as gather+matmul in ``ops/deform_conv.py``). Not
reproduced - broken or dead in the reference itself (SURVEY.md section
2.3): Cnn6Sobel* (undefined ``miniSobel``, models.py:2885) and the DCLS
variants (commented-out CUDA dependency).

Layouts: NHWC / NWC channels-last throughout; eval-mode BN folds into
scale/shift; train mode uses batch stats with functional running-stat
updates via ``BnCtx``.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field, replace
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.config import NUM_CLASSES, FrontendConfig, SpecAugmentConfig
from audioset_convnext_inf_tpu.models import layers as L
from audioset_convnext_inf_tpu.models import pann_layers as P
from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend
from audioset_convnext_inf_tpu.ops.mixup import do_mixup
from audioset_convnext_inf_tpu.ops.specaugment import spec_augment

Array = jnp.ndarray
Params = Dict[str, Any]

# PANN frontend: 64 mels, fmin 50, fmax 14000 on 32 kHz (models.py:2104-2115);
# SpecAugment freq_drop_width=8 (vs ConvNeXt's 28).
PANN_FRONTEND = FrontendConfig(n_mels=64)
PANN_SPECAUG = SpecAugmentConfig(freq_drop_width=8)

FRONTEND_16K = FrontendConfig(sample_rate=16000, n_fft=512, win_length=512,
                              hop_length=160, n_mels=64, fmax=8000.0)
FRONTEND_8K = FrontendConfig(sample_rate=8000, n_fft=256, win_length=256,
                             hop_length=80, n_mels=64, fmax=4000.0)


@dataclass(frozen=True)
class PannConfig:
    name: str
    family: str  # cnn | sed | resnet | mobilenet_v1 | mobilenet_v2 | leenet | dainet | res1dnet | wavegram
    frontend: FrontendConfig = PANN_FRONTEND
    classes_num: int = NUM_CLASSES
    # cnn family
    channels: Tuple[int, ...] = (64, 128, 256, 512, 1024, 2048)
    block: str = "conv"  # conv (double 3x3) | conv5x5 | sep | seppw
    # per-block deformable-conv switches (Cnn14Deformable/Cnn6Deformable,
    # models.py:2503-2602/3054-3149); empty = all regular
    deformable_blocks: Tuple[int, ...] = ()
    fc1_out: int = 0  # 0 = same as trunk output channels
    block_dropout: float = 0.2
    head_dropout: float = 0.5
    use_spec_augment: bool = True
    mixup_on_waveform: bool = False
    # sed family
    sed_head: str = "max"  # max | avg | att
    interpolate_ratio: int = 32
    # resnet family
    resnet_block: str = "basic"
    resnet_layers: Tuple[int, ...] = (2, 2, 2, 2)
    # leenet family
    lee_double: bool = False
    lee_channels: Tuple[int, ...] = (64, 64, 64, 128, 128, 128, 128, 128, 256)
    # res1dnet family
    res1d_layers: Tuple[int, ...] = (2, 2, 2, 2, 2, 2, 2)
    # wavegram family
    wavegram_logmel: bool = False
    # cnn_next hybrid family (models.py:268-1876): non-residual ConvNeXt-ish
    # blocks; each entry = (in_ch, out_ch, kernel, pool_type)
    next_blocks: Tuple[Tuple[int, int, int, str], ...] = ()
    next_stem: bool = True  # Conv2d(1,64,k4,s2) + channels-first LN
    next_group1: bool = False  # BlockGroup1: dwconv stays in->in
    use_fc1: bool = True
    spec_augment: SpecAugmentConfig = PANN_SPECAUG


class _Ctx:
    """Per-forward bundle: BN mode, PRNG stream, train flag."""

    def __init__(self, train_key: Optional[jax.Array]):
        self.train = train_key is not None
        self.bn = P.BnCtx(self.train)
        self.keys = P.KeyStream(train_key)

    def drop(self, x, rate):
        return P.dropout(x, rate, self.keys())


def _frontend_bn0(cfg: PannConfig, params, waveform, ctx: _Ctx,
                  frontend: LogMelFrontend, mixup_lambda):
    """Shared prologue: logmel -> bn0(mel axis) -> SpecAugment -> mixup.

    Returns NHWC (B, T, M, 1) plus the original frame count.
    """
    spec = frontend(waveform)  # (B, 1, T, M)
    x = jnp.transpose(spec, (0, 2, 3, 1))
    frames_num = x.shape[1]
    xm = jnp.squeeze(x, axis=-1)
    xm = ctx.bn(xm, params["bn0"], "bn0", axis=2)
    x = xm[..., None]
    if ctx.train and cfg.use_spec_augment:
        k = ctx.keys()
        x = spec_augment(k, x, time_axis=1, freq_axis=2, cfg=cfg.spec_augment)
    if ctx.train and mixup_lambda is not None and not cfg.mixup_on_waveform:
        x = do_mixup(x, mixup_lambda)
    return x, frames_num


def _pool_head(x: Array, params, cfg: PannConfig, ctx: _Ctx):
    """Freq-mean, time max+mean, fc1+relu, sigmoid head (models.py:2167-2177).

    x: (B, T', F', C) NHWC.
    """
    x = jnp.mean(x, axis=2)  # (B, T', C)
    x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
    x = ctx.drop(x, cfg.head_dropout)
    x = jax.nn.relu(L.linear(x, params["fc1"]["w"], params["fc1"]["b"]))
    embedding = ctx.drop(x, cfg.head_dropout)
    logits = L.linear(x, params["fc_audioset"]["w"], params["fc_audioset"]["b"])
    return {
        "clipwise_output": jax.nn.sigmoid(logits),
        "clipwise_logits": logits,
        "embedding": embedding,
    }


def _pool_head_1d(x: Array, params, cfg: PannConfig, ctx: _Ctx):
    """1-D variant: time max+mean only (LeeNet/DaiNet/Res1d, models.py:4348)."""
    x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
    x = ctx.drop(x, cfg.head_dropout)
    x = jax.nn.relu(L.linear(x, params["fc1"]["w"], params["fc1"]["b"]))
    embedding = ctx.drop(x, cfg.head_dropout)
    logits = L.linear(x, params["fc_audioset"]["w"], params["fc_audioset"]["b"])
    return {
        "clipwise_output": jax.nn.sigmoid(logits),
        "clipwise_logits": logits,
        "embedding": embedding,
    }


# ---------------------------------------------------------------------------
# CNN family (Cnn6/Cnn10/Cnn14 + emb/mel/sr/ablation variants)
# ---------------------------------------------------------------------------

_BLOCK_INIT = {
    "conv": P.init_conv_block,
    "conv5x5": P.init_conv_block5x5,
    "sep": P.init_conv_block_sep,
    "seppw": P.init_conv_block_seppw,
}
_BLOCK_FWD = {
    "conv": P.conv_block,
    "conv5x5": P.conv_block5x5,
    "sep": P.conv_block_sep,
    "seppw": P.conv_block_seppw,
}


def _deform_kernel(block: str) -> int:
    return 5 if block == "conv5x5" else 3


def init_cnn(key, cfg: PannConfig) -> Params:
    keys = iter(jax.random.split(key, len(cfg.channels) + 3))
    params: Params = {"bn0": P.init_bn(cfg.frontend.n_mels)}
    in_ch = 1
    for i, out_ch in enumerate(cfg.channels):
        if (i + 1) in cfg.deformable_blocks:
            params[f"conv_block{i + 1}"] = P.init_conv_block_deformable(
                next(keys), in_ch, out_ch, _deform_kernel(cfg.block)
            )
        else:
            params[f"conv_block{i + 1}"] = _BLOCK_INIT[cfg.block](next(keys), in_ch, out_ch)
        in_ch = out_ch
    fc1_out = cfg.fc1_out or in_ch
    params["fc1"] = P.glorot_linear(next(keys), in_ch, fc1_out)
    params["fc_audioset"] = P.glorot_linear(next(keys), fc1_out, cfg.classes_num)
    return params


def apply_cnn(params, waveform, cfg: PannConfig, frontend: LogMelFrontend,
              train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    if ctx.train and cfg.mixup_on_waveform and mixup_lambda is not None:
        waveform = do_mixup(waveform, mixup_lambda)  # Cnn14_mixup_time_domain:5402
    x, _ = _frontend_bn0(cfg, params, waveform, ctx, frontend, mixup_lambda)
    n = len(cfg.channels)
    for i in range(n):
        # Cnn14 pools (2,2) for blocks 1-5 and (1,1) for block 6; the 4-block
        # Cnn6/Cnn10 pool (2,2) everywhere (models.py:2154-2165, 2836-2844, 3216)
        pool = (1, 1) if (n == 6 and i == n - 1) else (2, 2)
        if (i + 1) in cfg.deformable_blocks:
            x = P.conv_block_deformable(x, params[f"conv_block{i + 1}"], ctx.bn,
                                        f"conv_block{i + 1}", pool_size=pool,
                                        pool_type="avg", kernel=_deform_kernel(cfg.block))
        else:
            x = _BLOCK_FWD[cfg.block](x, params[f"conv_block{i + 1}"], ctx.bn,
                                      f"conv_block{i + 1}", pool_size=pool, pool_type="avg")
        x = ctx.drop(x, cfg.block_dropout)
    out = _pool_head(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


# ---------------------------------------------------------------------------
# CNN-with-ConvNeXt-block hybrids (models.py:268-1876, the paper's ablation
# ladder between PANN CNNs and ConvNeXt)
# ---------------------------------------------------------------------------


def _init_next_block(key, in_ch, out_ch, kernel, group1: bool, pool: str) -> Params:
    """models.py Block:61-128 / BlockGroup1:132-200 (layer_scale=0 -> no
    gamma; residual is commented out in the reference = non-residual)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    dw_out = in_ch if group1 else out_ch
    mlp_dim = dw_out
    p: Params = {
        # grouped conv in->dw_out with groups=in_ch: HWIO (k, k, 1, dw_out)
        "dwconv": {
            "w": jax.nn.initializers.glorot_uniform()(k1, (kernel, kernel, 1, dw_out)),
            "b": jnp.zeros((dw_out,)),
        },
        "norm": L.init_layer_norm(mlp_dim),
        "pwconv1": P.glorot_linear(k2, mlp_dim, 4 * mlp_dim),
        "pwconv2": P.glorot_linear(k3, 4 * mlp_dim, mlp_dim),
    }
    if pool == "conv":
        ds_out = out_ch if group1 else out_ch
        p["downsample"] = {
            "norm": L.init_layer_norm(mlp_dim),
            "conv": P.glorot_conv(k4, 2, 2, mlp_dim, ds_out, bias=True),
        }
    return p


def _next_block(x, p, ctx: _Ctx, in_ch: int, kernel: int, pool: str) -> Array:
    pad = kernel // 2
    x = L.conv2d(x, p["dwconv"]["w"], p["dwconv"]["b"], padding=(pad, pad),
                 feature_group_count=in_ch)
    x = L.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], 1e-6)
    x = L.linear(x, p["pwconv1"]["w"], p["pwconv1"]["b"])
    x = L.gelu(x)
    x = L.linear(x, p["pwconv2"]["w"], p["pwconv2"]["b"])
    if pool == "conv":
        d = p["downsample"]
        x = L.layer_norm(x, d["norm"]["scale"], d["norm"]["bias"], 1e-6)
        x = L.conv2d(x, d["conv"]["w"], d["conv"]["b"], stride=(2, 2), padding="VALID")
        return x
    if pool == "no":
        return x
    return P.pool2d(x, (2, 2), pool)


def init_cnn_next(key, cfg: PannConfig) -> Params:
    keys = iter(jax.random.split(key, len(cfg.next_blocks) + 4))
    params: Params = {"bn0": P.init_bn(cfg.frontend.n_mels)}
    if cfg.next_stem:
        params["stem"] = {
            "conv": P.glorot_conv(next(keys), 4, 4, 1, 64, bias=True),
            "norm": L.init_layer_norm(64),
        }
    params["blocks"] = [
        _init_next_block(next(keys), i, o, k, cfg.next_group1, pool)
        for (i, o, k, pool) in cfg.next_blocks
    ]
    feat = cfg.next_blocks[-1][1]
    if cfg.use_fc1:
        fc1_out = cfg.fc1_out or feat
        params["fc1"] = P.glorot_linear(next(keys), feat, fc1_out)
        head_in = fc1_out
    else:
        head_in = feat
    params["fc_audioset"] = P.glorot_linear(next(keys), head_in, cfg.classes_num)
    return params


def apply_cnn_next(params, waveform, cfg: PannConfig, frontend: LogMelFrontend,
                   train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x, _ = _frontend_bn0(cfg, params, waveform, ctx, frontend, mixup_lambda)
    if cfg.next_stem:
        x = L.conv2d(x, params["stem"]["conv"]["w"], params["stem"]["conv"]["b"],
                     stride=(2, 2), padding="VALID")
        x = L.layer_norm(x, params["stem"]["norm"]["scale"], params["stem"]["norm"]["bias"], 1e-6)
    for blk, (i, o, k, pool) in zip(params["blocks"], cfg.next_blocks):
        x = _next_block(x, blk, ctx, i, k, pool)
        x = ctx.drop(x, cfg.block_dropout)
    x = jnp.mean(x, axis=2)
    x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)
    x = ctx.drop(x, cfg.head_dropout)
    if cfg.use_fc1:
        x = jax.nn.relu(L.linear(x, params["fc1"]["w"], params["fc1"]["b"]))
    embedding = ctx.drop(x, cfg.head_dropout)
    logits = L.linear(x, params["fc_audioset"]["w"], params["fc_audioset"]["b"])
    return {
        "clipwise_output": jax.nn.sigmoid(logits),
        "clipwise_logits": logits,
        "embedding": embedding,
        "bn_updates": ctx.bn.updates,
    }


# ---------------------------------------------------------------------------
# SED decision-level heads (models.py:5678-5982)
# ---------------------------------------------------------------------------


def init_sed(key, cfg: PannConfig) -> Params:
    k1, k2 = jax.random.split(key)
    params = init_cnn(k1, cfg)
    if cfg.sed_head == "att":
        fc1_out = cfg.fc1_out or cfg.channels[-1]
        params["att_block"] = P.init_att_block(k2, fc1_out, cfg.classes_num)
        del params["fc_audioset"]
    return params


def apply_sed(params, waveform, cfg: PannConfig, frontend: LogMelFrontend,
              train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x, frames_num = _frontend_bn0(cfg, params, waveform, ctx, frontend, mixup_lambda)
    n = len(cfg.channels)
    for i in range(n):
        pool = (2, 2) if i < n - 1 else (1, 1)
        x = P.conv_block(x, params[f"conv_block{i + 1}"], ctx.bn,
                         f"conv_block{i + 1}", pool_size=pool, pool_type="avg")
        x = ctx.drop(x, cfg.block_dropout)
    x = jnp.mean(x, axis=2)  # (B, T', C)
    # local smoothing: max+avg pool1d k=3 s=1 p=1 over time
    x1 = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 1), (1, 1, 1),
                               ((0, 0), (1, 1), (0, 0)))
    x2 = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 1), (1, 1, 1),
                               ((0, 0), (1, 1), (0, 0))) / 3.0
    x = x1 + x2
    x = ctx.drop(x, 0.5)
    x = jax.nn.relu(L.linear(x, params["fc1"]["w"], params["fc1"]["b"]))

    if cfg.sed_head == "att":
        x = ctx.drop(x, 0.5)
        clipwise, _, segmentwise = P.att_block(x, params["att_block"], activation="sigmoid")
    else:
        x = ctx.drop(x, 0.5)
        segmentwise = jax.nn.sigmoid(
            L.linear(x, params["fc_audioset"]["w"], params["fc_audioset"]["b"])
        )
        if cfg.sed_head == "max":
            clipwise = jnp.max(segmentwise, axis=1)
        else:
            clipwise = jnp.mean(segmentwise, axis=1)

    framewise = P.interpolate_time(segmentwise, cfg.interpolate_ratio)
    framewise = P.pad_framewise_output(framewise, frames_num)
    return {
        "framewise_output": framewise,
        "segmentwise_output": segmentwise,
        "clipwise_output": clipwise,
        "bn_updates": ctx.bn.updates,
    }


# ---------------------------------------------------------------------------
# ResNet family (models.py:3437-3697)
# ---------------------------------------------------------------------------


def init_resnet_model(key, cfg: PannConfig) -> Params:
    ks = jax.random.split(key, 5)
    expansion = 1 if cfg.resnet_block == "basic" else 4
    params: Params = {
        "bn0": P.init_bn(cfg.frontend.n_mels),
        "conv_block1": P.init_conv_block(ks[0], 1, 64),
        "resnet": P.init_resnet(ks[1], cfg.resnet_block, cfg.resnet_layers),
        "conv_block_after1": P.init_conv_block(ks[2], 512 * expansion, 2048),
        "fc1": P.glorot_linear(ks[3], 2048, 2048),
        "fc_audioset": P.glorot_linear(ks[4], 2048, cfg.classes_num),
    }
    return params


def apply_resnet_model(params, waveform, cfg: PannConfig, frontend: LogMelFrontend,
                       train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x, _ = _frontend_bn0(cfg, params, waveform, ctx, frontend, mixup_lambda)
    x = P.conv_block(x, params["conv_block1"], ctx.bn, "conv_block1", (2, 2), "avg")
    x = ctx.drop(x, 0.2)
    x = P.resnet_forward(x, params["resnet"], ctx.bn, "resnet", cfg.resnet_block, ctx.keys)
    x = P.pool2d(x, (2, 2), "avg")
    x = ctx.drop(x, 0.2)
    x = P.conv_block(x, params["conv_block_after1"], ctx.bn, "conv_block_after1", (1, 1), "avg")
    x = ctx.drop(x, 0.2)
    out = _pool_head(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


# ---------------------------------------------------------------------------
# MobileNet V1/V2 (models.py:3971-4268)
# ---------------------------------------------------------------------------

_MBV1_LADDER = [(32, 64, 1), (64, 128, 2), (128, 128, 1), (128, 256, 2), (256, 256, 1),
                (256, 512, 2), (512, 512, 1), (512, 512, 1), (512, 512, 1), (512, 512, 1),
                (512, 512, 1), (512, 1024, 2), (1024, 1024, 1)]

_MBV2_SETTING = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
                 (6, 96, 3, 2), (6, 160, 3, 1), (6, 320, 1, 1)]


def init_mobilenet_v1(key, cfg: PannConfig) -> Params:
    keys = iter(jax.random.split(key, len(_MBV1_LADDER) + 4))
    params: Params = {
        "bn0": P.init_bn(cfg.frontend.n_mels),
        "conv_bn": P.init_mb_conv_bn(next(keys), 1, 32),
        "blocks": [P.init_mb_conv_dw(next(keys), i, o) for i, o, _ in _MBV1_LADDER],
        "fc1": P.glorot_linear(next(keys), 1024, 1024),
        "fc_audioset": P.glorot_linear(next(keys), 1024, cfg.classes_num),
    }
    return params


def apply_mobilenet_v1(params, waveform, cfg, frontend, train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x, _ = _frontend_bn0(cfg, params, waveform, ctx, frontend, mixup_lambda)
    x = P.mb_conv_bn(x, params["conv_bn"], ctx.bn, "conv_bn", stride=2)
    for i, (_, _, s) in enumerate(_MBV1_LADDER):
        x = P.mb_conv_dw(x, params["blocks"][i], ctx.bn, f"blocks.{i}", stride=s)
    out = _pool_head(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


def init_mobilenet_v2(key, cfg: PannConfig) -> Params:
    n_blocks = sum(n for _, _, n, _ in _MBV2_SETTING)
    keys = iter(jax.random.split(key, n_blocks + 5))
    blocks, expands = [], []
    in_ch = 32
    for t, c, n, s in _MBV2_SETTING:
        for i in range(n):
            blocks.append(P.init_inverted_residual(next(keys), in_ch, c, t))
            expands.append((t, s if i == 0 else 1))
            in_ch = c
    return {
        "bn0": P.init_bn(cfg.frontend.n_mels),
        "conv_bn": P.init_mb_conv_bn(next(keys), 1, 32),
        "blocks": blocks,
        "conv_1x1": P.glorot_conv(next(keys), 1, 1, in_ch, 1280),
        "bn_1x1": P.init_bn(1280),
        "fc1": P.glorot_linear(next(keys), 1280, 1024),
        "fc_audioset": P.glorot_linear(next(keys), 1024, cfg.classes_num),
    }


def _mbv2_block_meta() -> List[Tuple[int, int]]:
    meta = []
    for t, c, n, s in _MBV2_SETTING:
        for i in range(n):
            meta.append((t, s if i == 0 else 1))
    return meta


def apply_mobilenet_v2(params, waveform, cfg, frontend, train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x, _ = _frontend_bn0(cfg, params, waveform, ctx, frontend, mixup_lambda)
    x = P.mb_conv_bn(x, params["conv_bn"], ctx.bn, "conv_bn", stride=2)
    for i, ((t, s), blk) in enumerate(zip(_mbv2_block_meta(), params["blocks"])):
        x = P.inverted_residual(x, blk, ctx.bn, f"blocks.{i}", stride=s, expand_ratio=t)
    x = jax.nn.relu6(ctx.bn(L.conv2d(x, params["conv_1x1"]["w"]), params["bn_1x1"], "bn_1x1"))
    out = _pool_head(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


# ---------------------------------------------------------------------------
# Raw-waveform 1-D families
# ---------------------------------------------------------------------------


def init_leenet(key, cfg: PannConfig) -> Params:
    chans = cfg.lee_channels
    keys = iter(jax.random.split(key, len(chans) + 3))
    init_blk = P.init_lee_block2 if cfg.lee_double else P.init_lee_block
    params: Params = {"blocks": []}
    in_ch = 1
    for out_ch in chans:
        params["blocks"].append(init_blk(next(keys), in_ch, out_ch, 3))
        in_ch = out_ch
    fc1_out = cfg.fc1_out or in_ch
    params["fc1"] = P.glorot_linear(next(keys), in_ch, fc1_out)
    params["fc_audioset"] = P.glorot_linear(next(keys), fc1_out, cfg.classes_num)
    return params


def apply_leenet(params, waveform, cfg, frontend, train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x = waveform[:, :, None]  # NWC
    if ctx.train and mixup_lambda is not None:
        x = do_mixup(x, mixup_lambda)
    fwd = P.lee_block2 if cfg.lee_double else P.lee_block
    last = len(params["blocks"]) - 1
    for i, blk in enumerate(params["blocks"]):
        stride = 3 if i == 0 else 1
        pool = 1 if i == 0 else 3
        if cfg.lee_double and i == last:
            pool = 1
        x = fwd(x, blk, ctx.bn, f"blocks.{i}", kernel=3, stride=stride, pool_size=pool)
        # LeeNet24 drops between blocks but not after the final one
        # (models.py:4406-4442)
        if cfg.lee_double and i < last:
            x = ctx.drop(x, 0.1)
    out = _pool_head_1d(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


_DAI_LADDER = [(64, 64), (64, 128), (128, 256), (256, 512)]


def init_dainet(key, cfg: PannConfig) -> Params:
    keys = iter(jax.random.split(key, len(_DAI_LADDER) + 4))
    params: Params = {
        "conv0": P.glorot_conv1d(next(keys), 80, 1, 64),
        "bn0": P.init_bn(64),
        "blocks": [P.init_dai_block(next(keys), i, o, 3) for i, o in _DAI_LADDER],
        "fc1": P.glorot_linear(next(keys), 512, 512),
        "fc_audioset": P.glorot_linear(next(keys), 512, cfg.classes_num),
    }
    return params


def apply_dainet(params, waveform, cfg, frontend, train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x = waveform[:, :, None]
    if ctx.train and mixup_lambda is not None:
        x = do_mixup(x, mixup_lambda)
    x = ctx.bn(P.conv1d(x, params["conv0"]["w"], stride=4), params["bn0"], "bn0")
    # reference DaiNet19.forward pools *between* blocks (padding 0) after
    # blocks 1-3 only, never after block 4 (models.py:4560-4570)
    for i, blk in enumerate(params["blocks"]):
        x = P.dai_block(x, blk, ctx.bn, f"blocks.{i}", kernel=3, pool_size=1)
        if i < len(params["blocks"]) - 1:
            x = P.pool1d(x, 4, padding=0)
    out = _pool_head_1d(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


def init_res1dnet(key, cfg: PannConfig) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "conv0": P.glorot_conv1d(ks[0], 11, 1, 64),
        "bn0": P.init_bn(64),
        "resnet": P.init_res1dnet(ks[1], cfg.res1d_layers),
        "fc1": P.glorot_linear(ks[2], 2048, 2048),
        "fc_audioset": P.glorot_linear(ks[3], 2048, cfg.classes_num),
    }


def apply_res1dnet(params, waveform, cfg, frontend, train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    x = waveform[:, :, None]
    if ctx.train and mixup_lambda is not None:
        x = do_mixup(x, mixup_lambda)
    x = ctx.bn(P.conv1d(x, params["conv0"]["w"], stride=5, padding=5), params["bn0"], "bn0")
    x = P.res1dnet_forward(x, params["resnet"], ctx.bn, "resnet", ctx.keys)
    out = _pool_head_1d(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


# ---------------------------------------------------------------------------
# Wavegram family (models.py:4892-5205)
# ---------------------------------------------------------------------------


def _wavegram_groups(cfg: PannConfig) -> int:
    """Freq-group count of the wavegram reshape: 32 normally, 64 for the
    128-mel variant so widths align for the concat (models.py:4949, 5171)."""
    return 64 if (cfg.wavegram_logmel and cfg.frontend.n_mels == 128) else 32


def init_wavegram(key, cfg: PannConfig) -> Params:
    keys = iter(jax.random.split(key, 16))
    groups = _wavegram_groups(cfg)
    # pre_block3 always yields 4 channels after the freq-group reshape:
    # 128ch/32g for 64-mel, 256ch/64g for 128-mel (models.py:4936, 5145)
    pre3_out = 4 * groups
    params: Params = {
        "pre_conv0": P.glorot_conv1d(next(keys), 11, 1, 64),
        "pre_bn0": P.init_bn(64),
        "pre_block1": P.init_pre_wav_block(next(keys), 64, 64),
        "pre_block2": P.init_pre_wav_block(next(keys), 64, 128),
        "pre_block3": P.init_pre_wav_block(next(keys), 128, pre3_out),
        "pre_block4": P.init_conv_block(next(keys), 4, 64),
    }
    in1 = 128 if cfg.wavegram_logmel else 64
    channels = (64, 128, 256, 512, 1024, 2048)
    if cfg.wavegram_logmel:
        params["bn0"] = P.init_bn(cfg.frontend.n_mels)
        params["conv_block1"] = P.init_conv_block(next(keys), 1, 64)
        params["conv_block2"] = P.init_conv_block(next(keys), 128, 128)
    else:
        params["conv_block1"] = P.init_conv_block(next(keys), 1, 64)  # unused, parity
        params["conv_block2"] = P.init_conv_block(next(keys), 64, 128)
        params["bn0"] = P.init_bn(64)
    for i, out_ch in enumerate(channels[2:], start=3):
        params[f"conv_block{i}"] = P.init_conv_block(next(keys), channels[i - 2], out_ch)
    params["fc1"] = P.glorot_linear(next(keys), 2048, 2048)
    params["fc_audioset"] = P.glorot_linear(next(keys), 2048, cfg.classes_num)
    return params


def _wavegram_features(params, waveform, ctx: _Ctx, n_freq_groups: int):
    """1-D wavegram path -> 2-D feature map (models.py:4945-4951).

    NWC: (B, L, C). The reference reshapes (B, C, L) -> (B, C/32, 32, L) ->
    transpose to (B, C', T, 32); in channels-last that is (B, L, C) ->
    (B, L, 32, C/32) with freq = the 32-group axis.
    """
    a = jax.nn.relu(ctx.bn(P.conv1d(waveform[:, :, None], params["pre_conv0"]["w"],
                                    stride=5, padding=5), params["pre_bn0"], "pre_bn0"))
    a = P.pre_wav_block(a, params["pre_block1"], ctx.bn, "pre_block1", pool_size=4)
    a = P.pre_wav_block(a, params["pre_block2"], ctx.bn, "pre_block2", pool_size=4)
    a = P.pre_wav_block(a, params["pre_block3"], ctx.bn, "pre_block3", pool_size=4)
    b_, t_, c_ = a.shape
    # torch: reshape(B, C//g, g, T).transpose(2,3) with C-major grouping; in
    # channels-last: (B, T, C) -> (B, T, C//g, g) -> transpose freq in
    a = a.reshape(b_, t_, c_ // n_freq_groups, n_freq_groups)
    a = jnp.transpose(a, (0, 1, 3, 2))  # (B, T, g, C//g) -> NHWC with W=g
    a = P.conv_block(a, params["pre_block4"], ctx.bn, "pre_block4", pool_size=(2, 1), pool_type="avg")
    return a


def apply_wavegram(params, waveform, cfg, frontend, train_key=None, mixup_lambda=None):
    ctx = _Ctx(train_key)
    a1 = _wavegram_features(params, waveform, ctx, _wavegram_groups(cfg))

    if cfg.wavegram_logmel:
        spec = frontend(waveform)
        x = jnp.transpose(spec, (0, 2, 3, 1))
        xm = jnp.squeeze(x, axis=-1)
        xm = ctx.bn(xm, params["bn0"], "bn0", axis=2)
        x = xm[..., None]
        if ctx.train and cfg.use_spec_augment:
            x = spec_augment(ctx.keys(), x, time_axis=1, freq_axis=2, cfg=cfg.spec_augment)
        if ctx.train and mixup_lambda is not None:
            x = do_mixup(x, mixup_lambda)
            a1 = do_mixup(a1, mixup_lambda)
        x = P.conv_block(x, params["conv_block1"], ctx.bn, "conv_block1", (2, 2), "avg")
        # align time dims then concat along channels
        t = min(x.shape[1], a1.shape[1])
        x = jnp.concatenate([x[:, :t], a1[:, :t, : x.shape[2]]], axis=-1)
    else:
        if ctx.train and mixup_lambda is not None:
            a1 = do_mixup(a1, mixup_lambda)
        x = a1
    x = ctx.drop(x, 0.2)
    for i in range(2, 7):
        x = P.conv_block(x, params[f"conv_block{i}"], ctx.bn, f"conv_block{i}",
                         pool_size=(2, 2) if i < 6 else (1, 1), pool_type="avg")
        x = ctx.drop(x, 0.2)
    out = _pool_head(x, params, cfg, ctx)
    out["bn_updates"] = ctx.bn.updates
    return out


# ---------------------------------------------------------------------------
# Registry + API wrapper
# ---------------------------------------------------------------------------

_FAMILIES: Dict[str, Tuple[Callable, Callable]] = {
    "cnn": (init_cnn, apply_cnn),
    "cnn_next": (init_cnn_next, apply_cnn_next),
    "sed": (init_sed, apply_sed),
    "resnet": (init_resnet_model, apply_resnet_model),
    "mobilenet_v1": (init_mobilenet_v1, apply_mobilenet_v1),
    "mobilenet_v2": (init_mobilenet_v2, apply_mobilenet_v2),
    "leenet": (init_leenet, apply_leenet),
    "dainet": (init_dainet, apply_dainet),
    "res1dnet": (init_res1dnet, apply_res1dnet),
    "wavegram": (init_wavegram, apply_wavegram),
}


def _cnn14(name, **kw):
    kw.setdefault("family", "cnn")
    kw.setdefault("channels", (64, 128, 256, 512, 1024, 2048))
    return PannConfig(name=name, **kw)


PANN_REGISTRY: Dict[str, PannConfig] = {
    # PANN CNNs (models.py:2090,2773,3150)
    "Cnn14": _cnn14("Cnn14"),
    "Cnn14Sep": _cnn14("Cnn14Sep", block="sep"),
    "Cnn14SepPW": _cnn14("Cnn14SepPW", block="seppw"),
    # reference default is deformable=None (== plain); registered here with
    # the last two blocks deformable so the gather+matmul path is exercised
    "Cnn14Deformable": _cnn14("Cnn14Deformable", deformable_blocks=(5, 6)),
    "Cnn6Deformable": PannConfig(name="Cnn6Deformable", family="cnn",
                                 channels=(64, 128, 256, 512), block="conv5x5",
                                 deformable_blocks=(3, 4)),
    "Cnn6": PannConfig(name="Cnn6", family="cnn", channels=(64, 128, 256, 512), block="conv5x5"),
    "Cnn10": PannConfig(name="Cnn10", family="cnn", channels=(64, 128, 256, 512)),
    # ablations (models.py:2604,2688,5402)
    "Cnn14_no_specaug": _cnn14("Cnn14_no_specaug", use_spec_augment=False),
    "Cnn14_no_dropout": _cnn14("Cnn14_no_dropout", block_dropout=0.0, head_dropout=0.0),
    "Cnn14_mixup_time_domain": _cnn14("Cnn14_mixup_time_domain", mixup_on_waveform=True),
    # embedding-size variants (models.py:3698-3968)
    "Cnn14_emb512": _cnn14("Cnn14_emb512", fc1_out=512),
    "Cnn14_emb128": _cnn14("Cnn14_emb128", fc1_out=128),
    "Cnn14_emb32": _cnn14("Cnn14_emb32", fc1_out=32),
    # sample-rate / mel variants (models.py:5208-5676)
    "Cnn14_16k": _cnn14("Cnn14_16k", frontend=FRONTEND_16K),
    "Cnn14_8k": _cnn14("Cnn14_8k", frontend=FRONTEND_8K),
    "Cnn14_mel32": _cnn14("Cnn14_mel32", frontend=replace(PANN_FRONTEND, n_mels=32)),
    "Cnn14_mel128": _cnn14("Cnn14_mel128", frontend=replace(PANN_FRONTEND, n_mels=128)),
    # SED decision-level heads (models.py:5678-5982)
    "Cnn14_DecisionLevelMax": _cnn14("Cnn14_DecisionLevelMax", family="sed", sed_head="max"),
    "Cnn14_DecisionLevelAvg": _cnn14("Cnn14_DecisionLevelAvg", family="sed", sed_head="avg"),
    "Cnn14_DecisionLevelAtt": _cnn14("Cnn14_DecisionLevelAtt", family="sed", sed_head="att"),
    # ResNets (models.py:3437-3697)
    "ResNet22": PannConfig(name="ResNet22", family="resnet", resnet_layers=(2, 2, 2, 2)),
    "ResNet38": PannConfig(name="ResNet38", family="resnet", resnet_layers=(3, 4, 6, 3)),
    "ResNet54": PannConfig(name="ResNet54", family="resnet", resnet_block="bottleneck",
                           resnet_layers=(3, 4, 6, 3)),
    # MobileNets (models.py:3971-4268)
    "MobileNetV1": PannConfig(name="MobileNetV1", family="mobilenet_v1"),
    "MobileNetV2": PannConfig(name="MobileNetV2", family="mobilenet_v2"),
    # raw-waveform models (models.py:4296-4853)
    "LeeNet11": PannConfig(name="LeeNet11", family="leenet", fc1_out=512),
    "LeeNet24": PannConfig(name="LeeNet24", family="leenet", lee_double=True,
                           lee_channels=(64, 96, 128, 128, 256, 256, 512, 512, 1024)),
    "DaiNet19": PannConfig(name="DaiNet19", family="dainet"),
    "Res1dNet31": PannConfig(name="Res1dNet31", family="res1dnet",
                             res1d_layers=(2, 2, 2, 2, 2, 2, 2)),
    "Res1dNet51": PannConfig(name="Res1dNet51", family="res1dnet",
                             res1d_layers=(2, 3, 4, 6, 4, 3, 2)),
    # CNN-with-ConvNeXt-block hybrids (models.py:268-1876). Ladders read
    # from each class's __init__/forward; Cnn7Next's head is fixed (the
    # reference overwrites fc_audioset with a shape-incompatible layer).
    **{
        name: PannConfig(name=name, family="cnn_next", **kw)  # type: ignore[arg-type]
        for name, kw in {
            "Cnn6Next": dict(next_blocks=((64, 128, 7, "avg"), (128, 256, 7, "avg"), (256, 512, 7, "avg"))),
            "Cnn6Next11": dict(next_blocks=((64, 128, 11, "avg"), (128, 256, 11, "avg"), (256, 512, 11, "avg"))),
            "Cnn6Next13": dict(next_blocks=((64, 128, 13, "avg"), (128, 256, 13, "avg"), (256, 512, 13, "avg"))),
            "Cnn6NextNoLastPool": dict(next_blocks=((64, 128, 7, "avg"), (128, 256, 7, "avg"), (256, 512, 7, "no"))),
            "Cnn6NextConvPool": dict(next_blocks=((64, 128, 7, "conv"), (128, 256, 7, "conv"), (256, 512, 7, "conv"))),
            "Cnn6NextConvPoolGroup1": dict(
                next_blocks=((64, 128, 7, "conv"), (128, 256, 7, "conv"), (256, 512, 7, "conv")),
                next_group1=True),
            "Cnn6NextNoStem": dict(
                next_stem=False,
                next_blocks=((1, 64, 7, "avg"), (64, 128, 7, "avg"), (128, 256, 7, "avg"), (256, 512, 7, "no"))),
            "Cnn6Next11NoStem": dict(
                next_stem=False,
                next_blocks=((1, 64, 11, "avg"), (64, 128, 11, "avg"), (128, 256, 11, "avg"), (256, 512, 11, "no"))),
            "Cnn6Next13NoStem": dict(
                next_stem=False,
                next_blocks=((1, 64, 13, "avg"), (64, 128, 13, "avg"), (128, 256, 13, "avg"), (256, 512, 13, "no"))),
            "Cnn7Next": dict(
                next_stem=False, fc1_out=512,
                next_blocks=((1, 64, 7, "avg"), (64, 128, 7, "avg"), (128, 256, 7, "avg"),
                             (256, 512, 7, "avg"), (512, 1024, 7, "no"))),
            "Cnn8NextNoStemNoFC1": dict(
                next_stem=False, use_fc1=False,
                next_blocks=((1, 64, 7, "avg"), (64, 128, 7, "avg"), (128, 256, 7, "avg"),
                             (256, 512, 7, "avg"), (512, 1024, 7, "avg"), (1024, 2048, 7, "no"))),
            "Cnn10Next": dict(
                next_blocks=((64, 128, 7, "no"), (128, 128, 7, "avg"), (128, 256, 7, "no"),
                             (256, 256, 7, "avg"), (256, 512, 7, "no"), (512, 512, 7, "no"))),
            "Cnn10Next11": dict(
                next_blocks=((64, 128, 11, "no"), (128, 128, 11, "avg"), (128, 256, 11, "no"),
                             (256, 256, 11, "avg"), (256, 512, 11, "no"), (512, 512, 11, "no"))),
            "Cnn10NextNoStem": dict(
                next_stem=False,
                next_blocks=((1, 64, 7, "no"), (64, 128, 7, "no"), (128, 128, 7, "avg"),
                             (128, 256, 7, "no"), (256, 256, 7, "avg"), (256, 512, 7, "no"),
                             (512, 512, 7, "no"))),
            "Cnn10NextDropPath": dict(
                block_dropout=0.0,
                next_blocks=((64, 128, 7, "no"), (128, 128, 7, "avg"), (128, 256, 7, "no"),
                             (256, 256, 7, "avg"), (256, 512, 7, "no"), (512, 512, 7, "no"))),
            "Cnn14Next": dict(
                next_blocks=((64, 128, 7, "no"), (128, 128, 7, "avg"), (128, 256, 7, "no"),
                             (256, 256, 7, "avg"), (256, 512, 7, "no"), (512, 512, 7, "avg"),
                             (512, 1024, 7, "no"), (1024, 1024, 7, "avg"), (1024, 2048, 7, "no"),
                             (2048, 2048, 7, "no"))),
        }.items()
    },
    # Wavegram hybrids (models.py:4892-5205)
    "Wavegram_Cnn14": PannConfig(name="Wavegram_Cnn14", family="wavegram"),
    "Wavegram_Logmel_Cnn14": PannConfig(name="Wavegram_Logmel_Cnn14", family="wavegram",
                                        wavegram_logmel=True),
    "Wavegram_Logmel128_Cnn14": PannConfig(
        name="Wavegram_Logmel128_Cnn14", family="wavegram", wavegram_logmel=True,
        frontend=replace(PANN_FRONTEND, n_mels=128)),
}


class PannModel:
    """Bundled (config, params) with the reference forward surface."""

    def __init__(self, cfg: PannConfig, params: Params, compute_dtype=jnp.float32):
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self.frontend = LogMelFrontend(cfg.frontend, compute_dtype=compute_dtype)
        init_fn, apply_fn = _FAMILIES[cfg.family]
        self._apply = jax.jit(
            functools.partial(apply_fn, cfg=cfg, frontend=self.frontend)
        )

    def __call__(self, waveform, train_key=None, mixup_lambda=None):
        return self.forward(waveform)

    def forward(self, waveform) -> Dict[str, Array]:
        out = dict(self._apply(self.params, jnp.asarray(waveform)))
        out.pop("bn_updates", None)
        return out

    def forward_train(self, waveform, train_key, mixup_lambda=None) -> Dict[str, Array]:
        init_fn, apply_fn = _FAMILIES[self.cfg.family]
        return apply_fn(self.params, waveform, cfg=self.cfg, frontend=self.frontend,
                        train_key=train_key, mixup_lambda=mixup_lambda)

    def count_parameters(self) -> int:
        from audioset_convnext_inf_tpu.models.convnext import _flatten_with_names

        total = 0
        for path, leaf in _flatten_with_names(self.params):
            if path[-1] in ("mean", "var") or path[-1] == "block_meta":
                continue
            if hasattr(leaf, "size"):
                total += leaf.size
        return total


def create_pann_model(name: str, seed: int = 0, compute_dtype=jnp.float32) -> PannModel:
    """Build a zoo model by reference class name (the safe analog of
    main.py's ``eval(model_type)`` dispatch)."""
    if name not in PANN_REGISTRY:
        raise KeyError(f"unknown PANN model {name!r}; available: {sorted(PANN_REGISTRY)}")
    cfg = PANN_REGISTRY[name]
    init_fn, _ = _FAMILIES[cfg.family]
    params = init_fn(jax.random.PRNGKey(seed), cfg)
    return PannModel(cfg, params, compute_dtype=compute_dtype)
