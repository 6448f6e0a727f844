"""Functional building blocks for the PANN legacy model zoo.

TPU-native equivalents of the shared modules in pytorch/models.py
(ConvBlock:1877, ConvBlock5x5:1977, ConvBlockSep:2181, AttBlock:2059,
LeeNetConvBlock:4271/4362, DaiNetResBlock:4469, _Resnet*:3246-3435,
_ResnetBasicBlockWav1d:4609, ConvPreWavBlock:4855, MobileNet blocks:4000+).

Layout conventions: 2-D features are NHWC, 1-D features are NWC (channels
last - torch's NCW conv1d becomes lax.conv with ('NWC','WIO','NWC')).
BatchNorm in eval mode folds to scale/shift; train mode uses batch
statistics and reports updated running stats into an accumulator dict keyed
by parameter path, which the trainer merges back (pure-function analog of
torch's in-place running-stat mutation).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.models import layers as L

Array = jnp.ndarray
Params = Dict[str, object]


# ---------------------------------------------------------------------------
# Init helpers (models.py init_layer:15 / init_bn:28 - Xavier + zeroed BN mean)
# ---------------------------------------------------------------------------


def glorot_conv(key, kh, kw, in_ch, out_ch, bias=False) -> Params:
    w = jax.nn.initializers.glorot_uniform()(key, (kh, kw, in_ch, out_ch))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def glorot_conv1d(key, k, in_ch, out_ch, bias=False) -> Params:
    w = jax.nn.initializers.glorot_uniform()(key, (k, in_ch, out_ch))
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((out_ch,))
    return p


def glorot_linear(key, in_dim, out_dim) -> Params:
    return {
        "w": jax.nn.initializers.glorot_uniform()(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,)),
    }


def init_bn(dim: int) -> Params:
    return L.init_batch_norm(dim)


# ---------------------------------------------------------------------------
# Norm / dropout / pooling
# ---------------------------------------------------------------------------


class BnCtx:
    """Threads train-mode BN through pure functions.

    eval: running stats, folded. train: batch stats; updated running stats
    are collected into ``updates`` keyed by dotted path.
    """

    def __init__(self, train: bool = False):
        self.train = train
        self.updates: Dict[str, Params] = {}

    def __call__(self, x: Array, p: Params, path: str, axis: int = -1) -> Array:
        if not self.train:
            return L.batch_norm_apply(x, p, axis=axis)
        y, new_stats = L.batch_norm_train(x, p, axis=axis)
        self.updates[path] = new_stats
        return y


def dropout(x: Array, rate: float, key: Optional[jax.Array]) -> Array:
    if key is None or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape).astype(x.dtype)
    return x * mask / keep


class KeyStream:
    """Deterministic per-call-site PRNG splitting for dropout keys."""

    def __init__(self, key: Optional[jax.Array]):
        self._key = key

    def __call__(self) -> Optional[jax.Array]:
        if self._key is None:
            return None
        self._key, out = jax.random.split(self._key)
        return out


def pool2d(x: Array, pool_size: Tuple[int, int], pool_type: str = "avg") -> Array:
    """NHWC pooling with kernel == stride (torch F.*_pool2d defaults)."""
    if pool_type == "no" or pool_size == (1, 1):
        if pool_type in ("avg", "max", "no"):
            return x
    window = (1,) + tuple(pool_size) + (1,)

    def avg(v):
        s = jax.lax.reduce_window(v, 0.0, jax.lax.add, window, window, "VALID")
        return s / float(np.prod(pool_size))

    def mx(v):
        return jax.lax.reduce_window(v, -jnp.inf, jax.lax.max, window, window, "VALID")

    if pool_type == "avg":
        return avg(x)
    if pool_type == "max":
        return mx(x)
    if pool_type == "avg+max":
        return avg(x) + mx(x)
    raise ValueError(f"Incorrect pool_type {pool_type!r}")


def pool1d(x: Array, kernel: int, stride: Optional[int] = None, padding: int = 0,
           pool_type: str = "max") -> Array:
    """NWC 1-D pooling; stride defaults to kernel (torch semantics)."""
    stride = stride or kernel
    window = (1, kernel, 1)
    strides = (1, stride, 1)
    pads = ((0, 0), (padding, padding), (0, 0))
    if pool_type == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window, strides, pads)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
    if padding == 0:
        return s / float(kernel)
    # count_include_pad=True is torch's default for avg_pool1d
    return s / float(kernel)


def conv1d(x: Array, w: Array, b: Optional[Array] = None, stride: int = 1,
           padding: int = 0, dilation: int = 1, groups: int = 1) -> Array:
    """NWC conv1d, weights (K, in/groups, out)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# Conv blocks (2-D)
# ---------------------------------------------------------------------------


def init_conv_block(key, in_ch, out_ch) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": glorot_conv(k1, 3, 3, in_ch, out_ch),
        "conv2": glorot_conv(k2, 3, 3, out_ch, out_ch),
        "bn1": init_bn(out_ch),
        "bn2": init_bn(out_ch),
    }


def conv_block(x, p, bn: BnCtx, path: str, pool_size=(2, 2), pool_type="avg") -> Array:
    """Two 3x3 convs + BN + ReLU + pool (models.py ConvBlock:1877-1929)."""
    x = jax.nn.relu(bn(L.conv2d(x, p["conv1"]["w"], padding=(1, 1)), p["bn1"], path + ".bn1"))
    x = jax.nn.relu(bn(L.conv2d(x, p["conv2"]["w"], padding=(1, 1)), p["bn2"], path + ".bn2"))
    return pool2d(x, pool_size, pool_type)


def init_conv_block5x5(key, in_ch, out_ch) -> Params:
    return {"conv1": glorot_conv(key, 5, 5, in_ch, out_ch), "bn1": init_bn(out_ch)}


def conv_block5x5(x, p, bn: BnCtx, path: str, pool_size=(2, 2), pool_type="avg") -> Array:
    """One 5x5 conv + BN + ReLU + pool (models.py ConvBlock5x5:1977-2020)."""
    x = jax.nn.relu(bn(L.conv2d(x, p["conv1"]["w"], padding=(2, 2)), p["bn1"], path + ".bn1"))
    return pool2d(x, pool_size, pool_type)


def init_conv_block_sep(key, in_ch, out_ch) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": glorot_conv(k1, 3, 3, in_ch, out_ch),
        # depthwise second conv (groups=out_ch): HWIO with I=1
        "conv2": {"w": jax.nn.initializers.glorot_uniform()(k2, (3, 3, 1, out_ch))},
        "bn1": init_bn(out_ch),
        "bn2": init_bn(out_ch),
    }


def conv_block_sep(x, p, bn: BnCtx, path: str, pool_size=(2, 2), pool_type="avg") -> Array:
    """3x3 conv then 3x3 depthwise (models.py ConvBlockSep:2181-2227)."""
    x = jax.nn.relu(bn(L.conv2d(x, p["conv1"]["w"], padding=(1, 1)), p["bn1"], path + ".bn1"))
    dim = x.shape[-1]
    x = jax.nn.relu(
        bn(L.conv2d(x, p["conv2"]["w"], padding=(1, 1), feature_group_count=dim),
           p["bn2"], path + ".bn2")
    )
    return pool2d(x, pool_size, pool_type)


def init_deform_conv(key, k, in_ch, out_ch) -> Params:
    """DeformableConv2d params (models.py:202-236): zero-init offset and
    modulator convs + trunc-normal regular conv."""
    from audioset_convnext_inf_tpu.models.layers import trunc_normal

    return {
        "offset": {"w": jnp.zeros((k, k, in_ch, 2 * k * k)), "b": jnp.zeros((2 * k * k,))},
        "modulator": {"w": jnp.zeros((k, k, in_ch, k * k)), "b": jnp.zeros((k * k,))},
        "regular": {"w": trunc_normal(key, (k, k, in_ch, out_ch), std=0.02)},
    }


def deform_conv_apply(x: Array, p: Params, k: int) -> Array:
    """Forward of DeformableConv2d (models.py:237-265): offsets clamped to
    max(h,w)/4, modulator = 2*sigmoid(conv)."""
    from audioset_convnext_inf_tpu.ops.deform_conv import deform_conv2d

    pad = k // 2
    h, w = x.shape[1:3]
    max_offset = max(h, w) / 4.0
    offset = jnp.clip(L.conv2d(x, p["offset"]["w"], p["offset"]["b"], padding=(pad, pad)),
                      -max_offset, max_offset)
    modulator = 2.0 * jax.nn.sigmoid(
        L.conv2d(x, p["modulator"]["w"], p["modulator"]["b"], padding=(pad, pad))
    )
    return deform_conv2d(x, offset, p["regular"]["w"], mask=modulator, padding=(pad, pad))


def init_conv_block_seppw(key, in_ch, out_ch) -> Params:
    """ConvBlockSepPW (models.py:2330-2399): dense 3x3 + depthwise 3x3 +
    2x-expansion pointwise MLP."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "conv1": glorot_conv(k1, 3, 3, in_ch, out_ch),
        "conv2": {"w": jax.nn.initializers.glorot_uniform()(k2, (3, 3, 1, out_ch))},
        "bn1": init_bn(out_ch),
        "bn2": init_bn(out_ch),
        "pwconv1": glorot_linear(k3, out_ch, 2 * out_ch),
        "pwconv2": glorot_linear(k4, 2 * out_ch, out_ch),
    }


def conv_block_seppw(x, p, bn: BnCtx, path: str, pool_size=(2, 2), pool_type="avg") -> Array:
    import jax.nn as jnn

    x = jax.nn.relu(bn(L.conv2d(x, p["conv1"]["w"], padding=(1, 1)), p["bn1"], path + ".bn1"))
    dim = x.shape[-1]
    x = jax.nn.relu(
        bn(L.conv2d(x, p["conv2"]["w"], padding=(1, 1), feature_group_count=dim),
           p["bn2"], path + ".bn2")
    )
    x = L.linear(x, p["pwconv1"]["w"], p["pwconv1"]["b"])
    x = L.gelu(x)
    x = L.linear(x, p["pwconv2"]["w"], p["pwconv2"]["b"])
    return pool2d(x, pool_size, pool_type)


def init_conv_block_deformable(key, in_ch, out_ch, kernel: int = 3) -> Params:
    """ConvBlock/ConvBlock5x5 with deformable convs (models.py:1877-1929 with
    deformable=True)."""
    k1, k2 = jax.random.split(key)
    p = {
        "conv1": init_deform_conv(k1, kernel, in_ch, out_ch),
        "bn1": init_bn(out_ch),
    }
    if kernel == 3:  # double-conv block
        p["conv2"] = init_deform_conv(k2, kernel, out_ch, out_ch)
        p["bn2"] = init_bn(out_ch)
    return p


def conv_block_deformable(x, p, bn: BnCtx, path: str, pool_size=(2, 2),
                          pool_type="avg", kernel: int = 3) -> Array:
    x = jax.nn.relu(bn(deform_conv_apply(x, p["conv1"], kernel), p["bn1"], path + ".bn1"))
    if "conv2" in p:
        x = jax.nn.relu(bn(deform_conv_apply(x, p["conv2"], kernel), p["bn2"], path + ".bn2"))
    return pool2d(x, pool_size, pool_type)


# ---------------------------------------------------------------------------
# Attention pooling (models.py AttBlock:2059-2088)
# ---------------------------------------------------------------------------


def init_att_block(key, n_in, n_out) -> Params:
    k1, k2 = jax.random.split(key)
    return {"att": glorot_conv1d(k1, 1, n_in, n_out, bias=True),
            "cla": glorot_conv1d(k2, 1, n_in, n_out, bias=True)}


def att_block(x: Array, p: Params, activation: str = "sigmoid"):
    """x: (B, T, n_in) -> (clipwise (B, n_out), norm_att, cla).

    Clamped-softmax attention over time; 1x1 convs are plain matmuls.
    """
    att = jnp.einsum("btc,kco->bto", x, p["att"]["w"]) + p["att"]["b"]
    att = jax.nn.softmax(jnp.clip(att, -10, 10), axis=1)
    cla = jnp.einsum("btc,kco->bto", x, p["cla"]["w"]) + p["cla"]["b"]
    if activation == "sigmoid":
        cla = jax.nn.sigmoid(cla)
    clip_out = jnp.sum(att * cla, axis=1)
    return clip_out, att, cla


# ---------------------------------------------------------------------------
# 1-D waveform blocks
# ---------------------------------------------------------------------------


def init_lee_block(key, in_ch, out_ch, kernel) -> Params:
    return {"conv1": glorot_conv1d(key, kernel, in_ch, out_ch), "bn1": init_bn(out_ch)}


def lee_block(x, p, bn: BnCtx, path: str, kernel: int, stride: int, pool_size: int = 1) -> Array:
    x = jax.nn.relu(bn(conv1d(x, p["conv1"]["w"], stride=stride, padding=kernel // 2),
                       p["bn1"], path + ".bn1"))
    if pool_size != 1:
        x = pool1d(x, pool_size, padding=pool_size // 2)
    return x


def init_lee_block2(key, in_ch, out_ch, kernel) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": glorot_conv1d(k1, kernel, in_ch, out_ch),
        "conv2": glorot_conv1d(k2, kernel, out_ch, out_ch),
        "bn1": init_bn(out_ch),
        "bn2": init_bn(out_ch),
    }


def lee_block2(x, p, bn: BnCtx, path: str, kernel: int, stride: int, pool_size: int = 1) -> Array:
    x = jax.nn.relu(bn(conv1d(x, p["conv1"]["w"], stride=stride, padding=kernel // 2),
                       p["bn1"], path + ".bn1"))
    x = jax.nn.relu(bn(conv1d(x, p["conv2"]["w"], stride=1, padding=kernel // 2),
                       p["bn2"], path + ".bn2"))
    if pool_size != 1:
        x = pool1d(x, pool_size, padding=pool_size // 2)
    return x


def init_dai_block(key, in_ch, out_ch, kernel) -> Params:
    ks = jax.random.split(key, 5)
    p = {f"conv{i + 1}": glorot_conv1d(ks[i], kernel, out_ch if i else in_ch, out_ch)
         for i in range(4)}
    p["downsample"] = glorot_conv1d(ks[4], 1, in_ch, out_ch)
    for i in range(4):
        p[f"bn{i + 1}"] = init_bn(out_ch)
    p["bn4"]["scale"] = jnp.zeros_like(p["bn4"]["scale"])  # zero-init residual
    p["bn_downsample"] = init_bn(out_ch)
    return p


def dai_block(x, p, bn: BnCtx, path: str, kernel: int, pool_size: int = 1) -> Array:
    pad = kernel // 2
    out = jax.nn.relu(bn(conv1d(x, p["conv1"]["w"], padding=pad), p["bn1"], path + ".bn1"))
    out = jax.nn.relu(bn(conv1d(out, p["conv2"]["w"], padding=pad), p["bn2"], path + ".bn2"))
    out = jax.nn.relu(bn(conv1d(out, p["conv3"]["w"], padding=pad), p["bn3"], path + ".bn3"))
    out = bn(conv1d(out, p["conv4"]["w"], padding=pad), p["bn4"], path + ".bn4")
    if x.shape == out.shape:
        out = jax.nn.relu(out + x)
    else:
        ident = bn(conv1d(x, p["downsample"]["w"]), p["bn_downsample"], path + ".bn_downsample")
        out = jax.nn.relu(out + ident)
    if pool_size != 1:
        out = pool1d(out, pool_size, padding=pool_size // 2)
    return out


def init_pre_wav_block(key, in_ch, out_ch) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "conv1": glorot_conv1d(k1, 3, in_ch, out_ch),
        "conv2": glorot_conv1d(k2, 3, out_ch, out_ch),
        "bn1": init_bn(out_ch),
        "bn2": init_bn(out_ch),
    }


def pre_wav_block(x, p, bn: BnCtx, path: str, pool_size: int) -> Array:
    """Wavegram pre-block: conv + dilated conv + maxpool (models.py:4855-4890)."""
    x = jax.nn.relu(bn(conv1d(x, p["conv1"]["w"], padding=1), p["bn1"], path + ".bn1"))
    x = jax.nn.relu(bn(conv1d(x, p["conv2"]["w"], padding=2, dilation=2), p["bn2"], path + ".bn2"))
    return pool1d(x, pool_size)


# ---------------------------------------------------------------------------
# ResNet 2-D (models.py:3246-3435) and 1-D (4609-4744)
# ---------------------------------------------------------------------------


def init_resnet_basic_block(key, inplanes, planes, downsample: Optional[str]) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "conv1": glorot_conv(ks[0], 3, 3, inplanes, planes),
        "bn1": init_bn(planes),
        "conv2": glorot_conv(ks[1], 3, 3, planes, planes),
        "bn2": init_bn(planes),
    }
    p["bn2"]["scale"] = jnp.zeros_like(p["bn2"]["scale"])  # zero-init residual
    if downsample is not None:
        p["downsample"] = {"conv": glorot_conv(ks[2], 1, 1, inplanes, planes), "bn": init_bn(planes)}
    return p


def resnet_basic_block(x, p, bn: BnCtx, path: str, stride: int,
                       drop_key: Optional[jax.Array]) -> Array:
    identity = x
    out = pool2d(x, (2, 2), "avg") if stride == 2 else x
    out = jax.nn.relu(bn(L.conv2d(out, p["conv1"]["w"], padding=(1, 1)), p["bn1"], path + ".bn1"))
    out = dropout(out, 0.1, drop_key)
    out = bn(L.conv2d(out, p["conv2"]["w"], padding=(1, 1)), p["bn2"], path + ".bn2")
    if "downsample" in p:
        if stride == 2:
            identity = pool2d(identity, (2, 2), "avg")
        identity = bn(L.conv2d(identity, p["downsample"]["conv"]["w"]),
                      p["downsample"]["bn"], path + ".downsample.bn")
    return jax.nn.relu(out + identity)


def init_resnet_bottleneck(key, inplanes, planes, downsample: Optional[str]) -> Params:
    ks = jax.random.split(key, 4)
    width = planes
    out_ch = planes * 4
    p = {
        "conv1": glorot_conv(ks[0], 1, 1, inplanes, width),
        "bn1": init_bn(width),
        "conv2": glorot_conv(ks[1], 3, 3, width, width),
        "bn2": init_bn(width),
        "conv3": glorot_conv(ks[2], 1, 1, width, out_ch),
        "bn3": init_bn(out_ch),
    }
    p["bn3"]["scale"] = jnp.zeros_like(p["bn3"]["scale"])
    if downsample is not None:
        p["downsample"] = {"conv": glorot_conv(ks[3], 1, 1, inplanes, out_ch), "bn": init_bn(out_ch)}
    return p


def resnet_bottleneck(x, p, bn: BnCtx, path: str, stride: int,
                      drop_key: Optional[jax.Array]) -> Array:
    identity = x
    if stride == 2:
        x = pool2d(x, (2, 2), "avg")
    out = jax.nn.relu(bn(L.conv2d(x, p["conv1"]["w"]), p["bn1"], path + ".bn1"))
    out = jax.nn.relu(bn(L.conv2d(out, p["conv2"]["w"], padding=(1, 1)), p["bn2"], path + ".bn2"))
    out = dropout(out, 0.1, drop_key)
    out = bn(L.conv2d(out, p["conv3"]["w"]), p["bn3"], path + ".bn3")
    if "downsample" in p:
        if stride == 2:
            identity = pool2d(identity, (2, 2), "avg")
        identity = bn(L.conv2d(identity, p["downsample"]["conv"]["w"]),
                      p["downsample"]["bn"], path + ".downsample.bn")
    return jax.nn.relu(out + identity)


def init_resnet(key, block_type: str, layers: Sequence[int]) -> Params:
    """2-D trunk: 4 stages of basic/bottleneck blocks, avg-pool downsample."""
    expansion = 1 if block_type == "basic" else 4
    init_block = init_resnet_basic_block if block_type == "basic" else init_resnet_bottleneck
    inplanes = 64
    stages: List[List[Params]] = []
    keys = iter(jax.random.split(key, sum(layers) + 1))
    for stage_i, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
        stride = 1 if stage_i == 0 else 2
        stage = []
        for b in range(blocks):
            s = stride if b == 0 else 1
            need_ds = (s != 1 or inplanes != planes * expansion) and b == 0
            stage.append(init_block(next(keys), inplanes, planes, "ds" if need_ds else None))
            inplanes = planes * expansion
        stages.append(stage)
    return {"stages": stages}


def resnet_forward(x, p, bn: BnCtx, path: str, block_type: str,
                   keys: KeyStream) -> Array:
    fwd = resnet_basic_block if block_type == "basic" else resnet_bottleneck
    for si, stage in enumerate(p["stages"]):
        stride = 1 if si == 0 else 2
        for bi, bp in enumerate(stage):
            s = stride if bi == 0 else 1
            x = fwd(x, bp, bn, f"{path}.stages.{si}.{bi}", s, keys())
    return x


def init_res1d_block(key, inplanes, planes, downsample: Optional[str]) -> Params:
    ks = jax.random.split(key, 3)
    p = {
        "conv1": glorot_conv1d(ks[0], 3, inplanes, planes),
        "bn1": init_bn(planes),
        "conv2": glorot_conv1d(ks[1], 3, planes, planes),
        "bn2": init_bn(planes),
    }
    p["bn2"]["scale"] = jnp.zeros_like(p["bn2"]["scale"])
    if downsample is not None:
        p["downsample"] = {"conv": glorot_conv1d(ks[2], 1, inplanes, planes), "bn": init_bn(planes)}
    return p


def res1d_block(x, p, bn: BnCtx, path: str, stride: int, drop_key) -> Array:
    identity = x
    out = pool1d(x, stride) if stride != 1 else x
    out = jax.nn.relu(bn(conv1d(out, p["conv1"]["w"], padding=1), p["bn1"], path + ".bn1"))
    out = dropout(out, 0.1, drop_key)
    out = bn(conv1d(out, p["conv2"]["w"], padding=2, dilation=2), p["bn2"], path + ".bn2")
    if "downsample" in p:
        if stride != 1:
            identity = pool1d(identity, stride, pool_type="avg")
        identity = bn(conv1d(identity, p["downsample"]["conv"]["w"]),
                      p["downsample"]["bn"], path + ".downsample.bn")
    return jax.nn.relu(out + identity)


_RES1D_PLANES = (64, 128, 256, 512, 1024, 1024, 2048)


def init_res1dnet(key, layers: Sequence[int]) -> Params:
    inplanes = 64
    stages: List[List[Params]] = []
    keys = iter(jax.random.split(key, sum(layers) + 1))
    for stage_i, (planes, blocks) in enumerate(zip(_RES1D_PLANES, layers)):
        stride = 1 if stage_i == 0 else 4
        stage = []
        for b in range(blocks):
            s = stride if b == 0 else 1
            need_ds = (s != 1 or inplanes != planes) and b == 0
            stage.append(init_res1d_block(next(keys), inplanes, planes, "ds" if need_ds else None))
            inplanes = planes
        stages.append(stage)
    return {"stages": stages}


def res1dnet_forward(x, p, bn: BnCtx, path: str, keys: KeyStream) -> Array:
    for si, stage in enumerate(p["stages"]):
        stride = 1 if si == 0 else 4
        for bi, bp in enumerate(stage):
            s = stride if bi == 0 else 1
            x = res1d_block(x, bp, bn, f"{path}.stages.{si}.{bi}", s, keys())
    return x


# ---------------------------------------------------------------------------
# MobileNet blocks (models.py:4000-4141); stride realized as avg-pool
# ---------------------------------------------------------------------------


def init_mb_conv_bn(key, inp, oup) -> Params:
    return {"conv": glorot_conv(key, 3, 3, inp, oup), "bn": init_bn(oup)}


def mb_conv_bn(x, p, bn: BnCtx, path: str, stride: int) -> Array:
    x = L.conv2d(x, p["conv"]["w"], padding=(1, 1))
    if stride > 1:
        x = pool2d(x, (stride, stride), "avg")
    return jax.nn.relu(bn(x, p["bn"], path + ".bn"))


def init_mb_conv_dw(key, inp, oup) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "dw": {"w": jax.nn.initializers.glorot_uniform()(k1, (3, 3, 1, inp))},
        "bn1": init_bn(inp),
        "pw": glorot_conv(k2, 1, 1, inp, oup),
        "bn2": init_bn(oup),
    }


def mb_conv_dw(x, p, bn: BnCtx, path: str, stride: int) -> Array:
    x = L.conv2d(x, p["dw"]["w"], padding=(1, 1), feature_group_count=x.shape[-1])
    if stride > 1:
        x = pool2d(x, (stride, stride), "avg")
    x = jax.nn.relu(bn(x, p["bn1"], path + ".bn1"))
    x = jax.nn.relu(bn(L.conv2d(x, p["pw"]["w"]), p["bn2"], path + ".bn2"))
    return x


def init_inverted_residual(key, inp, oup, expand_ratio: int) -> Params:
    hidden = round(inp * expand_ratio)
    ks = jax.random.split(key, 3)
    p: Params = {}
    if expand_ratio != 1:
        p["expand"] = glorot_conv(ks[0], 1, 1, inp, hidden)
        p["bn_expand"] = init_bn(hidden)
    p["dw"] = {"w": jax.nn.initializers.glorot_uniform()(ks[1], (3, 3, 1, hidden))}
    p["bn_dw"] = init_bn(hidden)
    p["project"] = glorot_conv(ks[2], 1, 1, hidden, oup)
    p["bn_project"] = init_bn(oup)
    return p


def inverted_residual(x, p, bn: BnCtx, path: str, stride: int, expand_ratio: int) -> Array:
    inp = x.shape[-1]
    out = x
    if expand_ratio != 1:
        out = jax.nn.relu6(bn(L.conv2d(out, p["expand"]["w"]), p["bn_expand"], path + ".bn_expand"))
    hidden = out.shape[-1]
    out = L.conv2d(out, p["dw"]["w"], padding=(1, 1), feature_group_count=hidden)
    if stride > 1:
        out = pool2d(out, (stride, stride), "avg")
    out = jax.nn.relu6(bn(out, p["bn_dw"], path + ".bn_dw"))
    out = bn(L.conv2d(out, p["project"]["w"]), p["bn_project"], path + ".bn_project")
    if stride == 1 and inp == out.shape[-1]:
        return x + out
    return out


# ---------------------------------------------------------------------------
# SED helpers (pytorch_utils.py:140-177)
# ---------------------------------------------------------------------------


def interpolate_time(x: Array, ratio: int) -> Array:
    """(B, T, C) -> (B, T*ratio, C) nearest-repeat upsampling."""
    b, t, c = x.shape
    return jnp.repeat(x, ratio, axis=1)


def pad_framewise_output(framewise: Array, frames_num: int) -> Array:
    """Pad with the last frame's value to frames_num."""
    b, t, c = framewise.shape
    if t >= frames_num:
        return framewise[:, :frames_num]
    pad = jnp.repeat(framewise[:, -1:, :], frames_num - t, axis=1)
    return jnp.concatenate([framewise, pad], axis=1)
