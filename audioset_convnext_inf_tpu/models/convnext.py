"""TPU-native ConvNeXt audio-tagging trunk.

Re-design of the reference ConvNeXt (pytorch/convnext.py:44-511) as pure
functions over a parameter pytree:

 - NHWC end-to-end. The reference block permutes NCHW<->NHWC around its
   LayerNorm/MLP (convnext.py:77-84); here there are no permutes at all.
 - The "channels_first" LayerNorms of the downsample layers (convnext.py:227,
   232) become ordinary trailing-axis LayerNorms in NHWC - same math.
 - bn0, the BatchNorm2d(224) the reference applies by transposing the mel
   axis into channel position (convnext.py:219,304-306), is applied directly
   over the trailing mel axis and, in eval mode, folds into one fused
   scale/shift.
 - Depthwise 7x7 convs use ``feature_group_count=dim``; pointwise convs are
   Linear layers on the trailing axis (pure GEMMs on the MXU).
 - Stochastic depth / SpecAugment / mixup run only when a PRNG key is given.

Parameter pytree schema (shapes for convnext_tiny):

    bn0:        {scale,bias,mean,var}                 (224,)
    stem:       {conv:{w (kh,kw,1,96), b}, norm:{scale,bias}}
    downsample: [{norm:{...}, conv:{w (2,2,Cin,Cout), b}} x 3]
    stages:     [[{dwconv:{w (7,7,1,C), b}, norm, pwconv1:{w (C,4C), b},
                  pwconv2:{w (4C,C), b}, gamma (C,)} ...] x 4]
    final_norm: {scale,bias}                          (768,)
    head:       {w (768,527), b (527,)}
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.config import ConvNeXtConfig, FrontendConfig
from audioset_convnext_inf_tpu.models import layers as L
from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend
from audioset_convnext_inf_tpu.ops.specaugment import spec_augment
from audioset_convnext_inf_tpu.ops.mixup import do_mixup

Array = jnp.ndarray
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(key: jax.Array, cfg: ConvNeXtConfig) -> Params:
    """Random init matching the reference recipe (trunc_normal std=0.02 for
    conv/linear weights, zeros bias, ones/zeros norms, gamma=layer_scale)."""
    dims = cfg.dims
    (kh, kw), _, _ = cfg.stem_geometry()
    n_keys = 2 + 3 + sum(cfg.depths) * 3 + 1
    keys = iter(jax.random.split(key, n_keys))

    params: Params = {
        "bn0": L.init_batch_norm(cfg.frontend.n_mels),
        "stem": {
            "conv": L.init_conv(next(keys), kh, kw, cfg.in_chans, dims[0]),
            "norm": L.init_layer_norm(dims[0]),
        },
        "downsample": [
            {
                "norm": L.init_layer_norm(dims[i]),
                "conv": L.init_conv(next(keys), 2, 2, dims[i], dims[i + 1]),
            }
            for i in range(3)
        ],
        "stages": [],
        "final_norm": L.init_layer_norm(dims[-1]),
        "head": L.init_linear(next(keys), dims[-1], cfg.num_classes),
    }
    for i, depth in enumerate(cfg.depths):
        stage: List[Params] = []
        for _ in range(depth):
            dim = dims[i]
            block = {
                # depthwise: HWIO with I=1, O=dim (feature_group_count=dim)
                "dwconv": {
                    "w": L.trunc_normal(next(keys), (7, 7, 1, dim), std=0.02),
                    "b": jnp.zeros((dim,)),
                },
                "norm": L.init_layer_norm(dim),
                "pwconv1": L.init_linear(next(keys), dim, 4 * dim),
                "pwconv2": L.init_linear(next(keys), 4 * dim, dim),
            }
            if cfg.layer_scale_init_value > 0:
                block["gamma"] = cfg.layer_scale_init_value * jnp.ones((dim,))
            stage.append(block)
        params["stages"].append(stage)

    if cfg.head_init_scale != 1.0:
        params["head"]["w"] = params["head"]["w"] * cfg.head_init_scale
        params["head"]["b"] = params["head"]["b"] * cfg.head_init_scale
    return params


def count_parameters(params: Params) -> int:
    """Trainable parameter count; excludes bn0 running stats (match of the
    reference's ``count_parameters`` which sums p.requires_grad only)."""

    def _count(path, leaf):
        name = path[-1] if path else ""
        return 0 if name in ("mean", "var") else leaf.size

    leaves = _flatten_with_names(params)
    return sum(_count(p, l) for p, l in leaves)


def _flatten_with_names(tree, prefix=()) -> List[Tuple[Tuple[str, ...], Array]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten_with_names(v, prefix + (k,)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.extend(_flatten_with_names(v, prefix + (str(i),)))
    else:
        out.append((prefix, tree))
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _block_apply(
    x: Array,
    p: Params,
    eps: float,
    drop_prob: float,
    key: Optional[jax.Array],
    block_impl: str = "xla",
) -> Array:
    """ConvNeXt block (reference convnext.py:74-87), NHWC throughout."""
    dim = x.shape[-1]
    shortcut = x
    x = L.conv2d(x, p["dwconv"]["w"], p["dwconv"]["b"], padding=(3, 3), feature_group_count=dim)
    x = L.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps)
    x = L.linear(x, p["pwconv1"]["w"], p["pwconv1"]["b"])
    # "xla_approx": XLA ops with the tanh GELU (same numerics class as the
    # Pallas kernels; erf GELU is a slow polynomial expansion on the VPU)
    x = jax.nn.gelu(x, approximate=block_impl == "xla_approx")
    x = L.linear(x, p["pwconv2"]["w"], p["pwconv2"]["b"])
    if "gamma" in p:
        x = x * p["gamma"].astype(x.dtype)
    x = L.drop_path(x, key, drop_prob)
    return shortcut + x


def _stem_conv(x: Array, p: Params, cfg: ConvNeXtConfig) -> Array:
    """Audio patchify stem.

    When kernel == stride and the padding is a multiple of the stride (true
    for the (252,56), (56,) and (112,) stems), the conv is exactly a
    non-overlapping patch extraction: zero-pad, reshape into (kh, kw)
    patches, and one (kh*kw*Cin -> C) GEMM on the MXU - XLA's conv lowering
    wastes most of a 128-lane tile on the K=kh*kw*1 contraction otherwise.
    Falls back to lax.conv for the overlapping stems.
    """
    (kh, kw), stride, pad = cfg.stem_geometry()
    w, b_ = p["w"], p["b"]
    if (kh, kw) == stride and pad[0] % kh == 0 and pad[1] % kw == 0:
        b, h, wd, cin = x.shape
        x = jnp.pad(x, ((0, 0), (pad[0], pad[0]), (pad[1], pad[1]), (0, 0)))
        hp, wp = x.shape[1], x.shape[2]
        # drop any remainder rows/cols exactly like a VALID strided conv
        x = x[:, : (hp // kh) * kh, : (wp // kw) * kw, :]
        oh, ow = x.shape[1] // kh, x.shape[2] // kw
        patches = x.reshape(b, oh, kh, ow, kw, cin)
        patches = jnp.transpose(patches, (0, 1, 3, 2, 4, 5)).reshape(b, oh, ow, kh * kw * cin)
        wmat = w.reshape(kh * kw * cin, -1)  # HWIO flatten matches patch order
        return L.linear(patches, wmat, b_)
    return L.conv2d(x, w, b_, stride=stride, padding=pad)


def _downsample_hwbc(x: Array, p: Params, eps: float) -> Array:
    """Downsample layer (reference convnext.py:225-235) in (H, W, B, C):
    LayerNorm then 2x2 stride-2 conv as patchify-reshape + GEMM (the kernel
    equals the stride, so the conv is an exact non-overlapping patch GEMM)."""
    x = L.layer_norm(x, p["norm"]["scale"], p["norm"]["bias"], eps)
    H, W, B, C = x.shape
    x = x[: H // 2 * 2, : W // 2 * 2]
    x = x.reshape(H // 2, 2, W // 2, 2, B, C)
    x = jnp.transpose(x, (0, 2, 4, 1, 3, 5)).reshape(H // 2, W // 2, B, 4 * C)
    w = p["conv"]["w"]  # (2, 2, Cin, Cout) HWIO; flatten matches patch order
    return L.linear(x, w.reshape(4 * C, -1), p["conv"]["b"])


def _fused_block(x: Array, p: Params, eps: float, ht: int, mrows: int,
                 wch: int = 4) -> Array:
    from audioset_convnext_inf_tpu.ops.pallas_fused_block import fused_block_hwbc

    return fused_block_hwbc(
        x,
        p["dwconv"]["w"].reshape(7, 7, -1), p["dwconv"]["b"],
        p["norm"]["scale"], p["norm"]["bias"],
        p["pwconv1"]["w"], p["pwconv1"]["b"],
        p["pwconv2"]["w"], p["pwconv2"]["b"],
        p.get("gamma"), eps=eps, ht=ht, mrows=mrows, wch=wch,
    )


# (ht, mrows[, wch]) per fused stage index; tuned on v5e (NOTES.md). wch is
# the stencil w-chunk: one (wch+6)-wide window load serves wch output
# columns, so wide chunks amortize halo reloads (W=14 -> one chunk/row).
_FUSED_STAGE_TILES = {2: (3, 1, 14), 3: (1, 1, 7)}
# backward-kernel (ht, mrows) per stage (cfg.fused_train_blocks); the
# backward DMA classes need ht >= 3 and a last tile >= 3 rows (s3 H=63:
# 9x7; s4 H=31: 7x4+3). mrows=2 at s4 keeps the gradient GEMMs' M dim at
# 224 rows (vs 112) for MXU tiling.
_BWD_STAGE_TILES = {2: (7, 1), 3: (4, 2)}
# test hook: allow the fused stages under the CPU interpreter
_FUSED_ON_CPU = False


def forward_features(
    x: Array,
    params: Params,
    cfg: ConvNeXtConfig,
    train_key: Optional[jax.Array] = None,
    return_frame_embeddings: bool = False,
) -> Array:
    """Spectrogram image (B, T, M, 1) -> pooled (B, C) or frames (B, H, W, C).

    Mirrors reference forward_features (convnext.py:269-285): 4x
    (downsample, stage), then freq-mean + time-(max+mean) pooling and final
    LayerNorm; frame embeddings return *pre*-norm stage-4 output.

    With ``block_impl="xla_approx"`` at eval, stages 3-4 run in the
    (H, W, B, C) layout through the fully-fused block kernel (dwconv stencil
    overlapped with the MLP GEMMs); stages 1-2 keep NHWC with XLA's
    depthwise conv, whose lowering is already VPU-roofline-optimal at those
    channel counts (fusing them was measured slower - NOTES.md).
    """
    (_, _), stride, pad = cfg.stem_geometry()
    dp_rates = np.linspace(0.0, cfg.drop_path_rate, sum(cfg.depths))
    if train_key is not None:
        block_keys = jax.random.split(train_key, sum(cfg.depths))
    block_impl = cfg.block_impl
    # fused stages need eval mode, a sublane-aligned batch, and a real TPU
    # (in interpret mode on CPU the kernel is orders of magnitude slower
    # than the XLA fallback; tests opt back in via _FUSED_ON_CPU)
    batch = x.shape[0]
    try:
        # symbolic batch dims (jax.export dynamic-batch serving programs)
        # can't decide the %16 tiling gate - those programs take the pure
        # XLA trunk (engine/aot_export.py: dynamic is the overflow path)
        batch_aligned = int(batch) % 16 == 0
    except Exception:  # InconclusiveDimensionOperation on symbolic dims
        batch_aligned = False
    on_tpu = jax.default_backend() in ("tpu", "axon") or _FUSED_ON_CPU
    fused_stages = (
        block_impl == "xla_approx"
        and train_key is None and batch_aligned
        and on_tpu
    )
    # Training: route stages 3-4 through the fused kernels with the fused
    # custom-VJP backward (cfg.fused_train_blocks). Requires layer scale
    # (the VJP differentiates gamma) and no remat (the VJP already
    # recomputes LN/GELU from the saved dwconv output).
    fused_train = (
        cfg.fused_train_blocks
        and block_impl == "xla_approx"
        and train_key is not None and batch_aligned
        and on_tpu
        and cfg.layer_scale_init_value > 0
        and not cfg.remat_blocks
    )
    hwbc = False  # current layout flag
    cur = 0

    for i in range(4):
        if i == 0:
            x = _stem_conv(x, params["stem"]["conv"], cfg)
            x = L.layer_norm(x, params["stem"]["norm"]["scale"], params["stem"]["norm"]["bias"], cfg.ln_eps)
            # Materialize the stem-LN output: without the barrier XLA sinks
            # the f32 LN application into the first block's 7x7 dwconv
            # fusion, where the stencil's overlapping window reads recompute
            # it many times (profiled 8.5 vs 5.3 ms for that fusion; whole
            # model 82.6 -> 80.4 ms at B=128 eval, ~3 ms on the train step -
            # the same fusion signature shows up in the training forward).
            # The barrier is numerically an identity, and differentiates as
            # one (it is the same primitive jax.checkpoint builds on).
            x = jax.lax.optimization_barrier(x)
        else:
            d = params["downsample"][i - 1]
            if hwbc:
                x = _downsample_hwbc(x, d, cfg.ln_eps)
            else:
                x = L.layer_norm(x, d["norm"]["scale"], d["norm"]["bias"], cfg.ln_eps)
                x = L.conv2d(x, d["conv"]["w"], d["conv"]["b"], stride=(2, 2), padding="VALID")
        stage_h = x.shape[0] if hwbc else x.shape[1]  # post-downsample H
        bwd_ht, bwd_mrows = _BWD_STAGE_TILES.get(i, (3, 1))
        bwd_n_h = -(-stage_h // bwd_ht)
        bwd_ok = (bwd_n_h >= 2 and bwd_ht >= 3
                  and stage_h - (bwd_n_h - 1) * bwd_ht >= 3)
        stage_fusable = i in _FUSED_STAGE_TILES and (
            fused_stages or (fused_train and bwd_ok)
        )
        if stage_fusable:
            if not hwbc:
                x = jnp.transpose(x, (1, 2, 0, 3))  # NHWC -> HWBC
                hwbc = True
            # non-128-multiple widths run zero-padded lanes through the whole
            # stage (padded once here; the kernel preserves exact-zero pads)
            c_real = cfg.dims[i]
            cp = -(-c_real // 128) * 128
            if x.shape[-1] < cp:
                x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, cp - x.shape[-1])))
            tile = _FUSED_STAGE_TILES[i]
            ht, mrows = tile[0], tile[1]
            wch = tile[2] if len(tile) > 2 else 4
            if train_key is None:
                for block in params["stages"][i]:
                    x = _fused_block(x, block, cfg.ln_eps, ht, mrows, wch)
            else:
                from audioset_convnext_inf_tpu.ops.fused_block_train import (
                    FusedTrainTiles,
                    fused_block_train,
                )

                tiles = FusedTrainTiles(
                    eps=cfg.ln_eps, fwd_ht=ht, fwd_mrows=mrows, fwd_wch=wch,
                    bwd_ht=bwd_ht, bwd_mrows=bwd_mrows)
                for j, block in enumerate(params["stages"][i]):
                    dpr = float(dp_rates[cur + j])
                    if dpr > 0.0:
                        keep = 1.0 - dpr
                        s = jax.random.bernoulli(
                            block_keys[cur + j], keep, (batch,)
                        ).astype(jnp.float32) / keep
                    else:
                        s = jnp.ones((batch,), jnp.float32)
                    x = fused_block_train(
                        tiles, x,
                        block["dwconv"]["w"].reshape(7, 7, -1),
                        block["dwconv"]["b"],
                        block["norm"]["scale"], block["norm"]["bias"],
                        block["pwconv1"]["w"], block["pwconv1"]["b"],
                        block["pwconv2"]["w"], block["pwconv2"]["b"],
                        block["gamma"], s)
            if cp > c_real:
                x = x[..., :c_real]
        else:
            if hwbc:
                x = jnp.transpose(x, (2, 0, 1, 3))  # HWBC -> NHWC
                hwbc = False
            blk = _block_apply
            if cfg.remat_blocks and train_key is not None:
                # recompute the block in the backward instead of storing its
                # dwconv/LN/GELU activations; eps/drop_prob/impl are static
                blk = jax.checkpoint(_block_apply, static_argnums=(2, 3, 5))
            for j, block in enumerate(params["stages"][i]):
                k = block_keys[cur + j] if train_key is not None else None
                x = blk(x, block, cfg.ln_eps, float(dp_rates[cur + j]), k, block_impl)
        cur += cfg.depths[i]

    if return_frame_embeddings:
        if hwbc:
            x = jnp.transpose(x, (2, 0, 1, 3))
        return x  # (B, H=31, W=7, C) pre-norm, reference convnext.py:276-277

    if hwbc:
        # Pool directly in HWBC: mean over freq (axis 1), max+mean over time
        # (axis 0) -> (B, C); no transpose back needed.
        x = jnp.mean(x, axis=1)  # (H, B, C)
        x = jnp.max(x, axis=0) + jnp.mean(x, axis=0)  # (B, C)
    else:
        # Pool: mean over freq (W), then max+mean over time (H). NHWC: W=axis 2.
        x = jnp.mean(x, axis=2)  # (B, H, C)
        x = jnp.max(x, axis=1) + jnp.mean(x, axis=1)  # (B, C)
    return L.layer_norm(x, params["final_norm"]["scale"], params["final_norm"]["bias"], cfg.ln_eps)


def _frontend_and_bn0(
    waveform_or_spec: Array,
    params: Params,
    cfg: ConvNeXtConfig,
    frontend: Optional[LogMelFrontend],
    train: bool,
    key: Optional[jax.Array],
    mixup_lambda: Optional[Array],
    compute_dtype=jnp.float32,
) -> Array:
    """Waveform (B, N) -> augmented, normalized spectrogram image (B, T, M, 1).

    Replicates the shared prologue of the reference's three forward variants
    (convnext.py:287-316): waveform augmentations (train: pydub gain, roll,
    speed perturb, in the reference's order at convnext.py:288-296), logmel
    frontend, bn0 over the mel axis, SpecAugment (train), mixup (train).
    """
    if waveform_or_spec.ndim == 1:  # unbatched waveform convenience
        waveform_or_spec = waveform_or_spec[None, :]
    if waveform_or_spec.ndim == 2:
        if train and key is not None:
            from audioset_convnext_inf_tpu.ops.augment import (
                gain_augment,
                roll_augment,
                speed_perturb,
            )

            a = cfg.augment
            key, gkey, rkey, skey = jax.random.split(key, 4)
            if a.use_pydub_augment:
                waveform_or_spec = gain_augment(gkey, waveform_or_spec, a.gain_augment_db)
            if a.use_roll_augment:
                waveform_or_spec = roll_augment(rkey, waveform_or_spec, a.roll_shift_range)
            if a.use_speed_perturb:
                waveform_or_spec = speed_perturb(
                    skey, waveform_or_spec, a.speed_perturb_rates, a.speed_perturb_p
                )
        if frontend is None:
            frontend = LogMelFrontend(cfg.frontend, compute_dtype=compute_dtype)
        if not train and cfg.frontend.top_db is None:
            # eval-mode bn0 is a per-mel-bin affine over running stats: fold
            # it into the frontend's log chain (one fused elementwise op in
            # XLA; stays in VMEM in the Pallas kernel) instead of a separate
            # pass over the (B, T, M) log-mels. Reference convnext.py:304-306.
            bn = params["bn0"]
            a = bn["scale"] * jax.lax.rsqrt(bn["var"] + cfg.bn_eps)
            b_ = bn["bias"] - a * bn["mean"]
            spec = frontend(waveform_or_spec, affine=(a, b_))
            return jnp.transpose(spec, (0, 2, 3, 1)).astype(compute_dtype)
        spec = frontend(waveform_or_spec)  # (B, 1, T, M)
        x = jnp.transpose(spec, (0, 2, 3, 1))  # NHWC: (B, T, M, 1)
    else:
        x = waveform_or_spec  # already (B, T, M, 1)

    x = x.astype(compute_dtype)

    # bn0 over mel axis. NHWC mel is axis 2.
    bn_axis = 2
    xm = jnp.squeeze(x, axis=-1)  # (B, T, M)
    new_bn_stats = None
    if train:
        xm, new_bn_stats = L.batch_norm_train(xm, params["bn0"], eps=cfg.bn_eps, axis=bn_axis)
    else:
        xm = L.batch_norm_apply(xm, params["bn0"], eps=cfg.bn_eps, axis=bn_axis)
    x = xm[..., None]

    if train and cfg.augment.use_spec_augment and key is not None:
        key, sk = jax.random.split(key)
        x = spec_augment(
            sk,
            x,
            time_axis=1,
            freq_axis=2,
            cfg=cfg.augment.spec_augment,
        )

    if train and mixup_lambda is not None:
        x = do_mixup(x, mixup_lambda)

    return (x, new_bn_stats) if train else x


def forward(
    params: Params,
    waveform: Array,
    cfg: ConvNeXtConfig,
    frontend: Optional[LogMelFrontend] = None,
    train_key: Optional[jax.Array] = None,
    mixup_lambda: Optional[Array] = None,
    compute_dtype=jnp.float32,
) -> Dict[str, Array]:
    """Full forward (reference convnext.py:287-331).

    Returns {"clipwise_output": sigmoid probs, "clipwise_logits": logits}.
    ``train_key=None`` = eval mode (no SpecAugment/DropPath/mixup).
    """
    train = train_key is not None
    if train:
        train_key, aug_key, dp_key = jax.random.split(train_key, 3)
    else:
        aug_key = dp_key = None
    x = _frontend_and_bn0(waveform, params, cfg, frontend, train, aug_key, mixup_lambda, compute_dtype)
    if train:
        x, _ = x
    emb = forward_features(x, params, cfg, train_key=dp_key)
    logits = L.linear(emb, params["head"]["w"], params["head"]["b"]).astype(jnp.float32)
    return {"clipwise_output": jax.nn.sigmoid(logits), "clipwise_logits": logits}


def forward_train(
    params: Params,
    waveform: Array,
    cfg: ConvNeXtConfig,
    train_key: jax.Array,
    mixup_lambda: Optional[Array] = None,
    frontend: Optional[LogMelFrontend] = None,
    compute_dtype=jnp.float32,
) -> Tuple[Dict[str, Array], Params]:
    """Training forward: returns (outputs, new_bn0_running_stats).

    The training-mode prologue of reference forward (convnext.py:287-316):
    SpecAugment + mixup active, bn0 normalizes with batch statistics and its
    running stats update flows back to the trainer (torch mutates the module
    in place; here the update is explicit and pure).
    """
    train_key, aug_key, dp_key = jax.random.split(train_key, 3)
    x, new_bn_stats = _frontend_and_bn0(
        waveform, params, cfg, frontend, True, aug_key, mixup_lambda, compute_dtype
    )
    emb = forward_features(x, params, cfg, train_key=dp_key)
    logits = L.linear(emb, params["head"]["w"], params["head"]["b"]).astype(jnp.float32)
    return {"clipwise_output": jax.nn.sigmoid(logits), "clipwise_logits": logits}, new_bn_stats


def forward_scene_embeddings(
    params: Params,
    waveform: Array,
    cfg: ConvNeXtConfig,
    frontend: Optional[LogMelFrontend] = None,
    compute_dtype=jnp.float32,
) -> Array:
    """(B, N) -> (B, embed_dim) post-norm pooled embedding (convnext.py:333-366)."""
    x = _frontend_and_bn0(waveform, params, cfg, frontend, False, None, None, compute_dtype)
    return forward_features(x, params, cfg)


def forward_frame_embeddings(
    params: Params,
    waveform: Array,
    cfg: ConvNeXtConfig,
    frontend: Optional[LogMelFrontend] = None,
    compute_dtype=jnp.float32,
) -> Array:
    """(B, N) -> (B, C, H, W) pre-norm frame embeddings (convnext.py:369-402).

    Returned in the reference's NCHW layout (B, 768, 31, 7) for API parity;
    internally everything is NHWC and only this output view transposes.
    """
    x = _frontend_and_bn0(waveform, params, cfg, frontend, False, None, None, compute_dtype)
    feats = forward_features(x, params, cfg, return_frame_embeddings=True)
    return jnp.transpose(feats, (0, 3, 1, 2))
