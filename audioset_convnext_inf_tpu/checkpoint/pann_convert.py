"""torch -> JAX conversion for the PANN legacy zoo.

Rule-based: tensor layout transforms are chosen by rank + name, and module
paths are rewritten per family into the pytree layout of models/pann.py.
Covers the published PANN checkpoints (Cnn14_mAP=0.431.pth etc.) and every
registry model's state dict.

Layout rules:
 - conv2d ``.weight`` (O, I, kH, kW) -> HWIO (kH, kW, I, O)  [depthwise incl.]
 - conv1d ``.weight`` (O, I, K)     -> WIO (K, I, O)
 - linear ``.weight`` (O, I)        -> (I, O)
 - BN weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.models.pann import PANN_REGISTRY, PannConfig

Params = Dict[str, Any]

_BN_MAP = {"weight": "scale", "bias": "bias", "running_mean": "mean", "running_var": "var"}
_SKIP = ("spectrogram_extractor.", "logmel_extractor.", "spec_augmenter.", "num_batches_tracked")
_DEFORM_MAP = {"offset_conv": "offset", "modulator_conv": "modulator", "regular_conv": "regular"}


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def _transform(key: str, v: np.ndarray, is_bn: bool) -> Tuple[str, np.ndarray]:
    """Map a torch leaf (suffix, tensor) to (our leaf name, our layout)."""
    leaf = key.rsplit(".", 1)[-1]
    if is_bn:
        return _BN_MAP[leaf], v
    if leaf == "weight":
        if v.ndim == 4:
            return "w", np.transpose(v, (2, 3, 1, 0))
        if v.ndim == 3:
            return "w", np.transpose(v, (2, 1, 0))
        if v.ndim == 2:
            return "w", np.ascontiguousarray(v.T)
        return "w", v
    if leaf == "bias":
        return "b", v
    return leaf, v


def _set(tree: Params, path: List, leaf: str, value: np.ndarray) -> None:
    node = tree
    for i, p in enumerate(path):
        next_is_int = i + 1 < len(path) and (
            isinstance(path[i + 1], int)
            or (isinstance(path[i + 1], str) and path[i + 1].isdigit())
        )
        empty = [] if next_is_int else {}
        if isinstance(p, int):
            while len(node) <= p:
                node.append([] if next_is_int else {})
            node = node[p]
        else:
            if p not in node:
                node[p] = empty
            node = node[p]
    node[leaf] = jnp.asarray(value)


def _rewrite_path(cfg: PannConfig, key: str, block_rank=None) -> List:
    """torch module path -> our pytree path (list of str/int)."""
    parts = key.split(".")[:-1]  # drop leaf
    fam = cfg.family

    def as_list(prefix_re, container):
        m = re.match(prefix_re, parts[0])
        if m:
            idx = int(m.group(1)) - 1
            return [container, idx] + parts[1:]
        return None

    if fam in ("leenet", "dainet"):
        got = as_list(r"conv_block(\d+)$", "blocks")
        if got:
            return got
        return parts
    if fam in ("res1dnet", "resnet"):
        if parts[0] == "resnet":
            return _resnet_path(parts)
        return parts
    if fam == "mobilenet_v1":
        if parts[0] == "features":
            fi = int(parts[1])
            li = int(parts[2])
            if fi == 0:
                return ["conv_bn", {0: "conv", 2: "bn"}[li]]
            name = {0: "dw", 2: "bn1", 4: "pw", 5: "bn2"}[li]
            return ["blocks", fi - 1, name]
        return parts
    if fam == "mobilenet_v2":
        if parts[0] == "features":
            fi = int(parts[1])
            total = len(_mbv2_meta())
            if fi == 0:
                li = int(parts[2])
                return ["conv_bn", {0: "conv", 2: "bn"}[li]]
            if fi == total + 1:  # trailing 1x1 conv-bn
                li = int(parts[3]) if len(parts) > 3 else int(parts[2])
                return [{0: "conv_1x1", 1: "bn_1x1"}[li]]
            li = int(parts[3])
            blk = ["blocks", fi - 1]
            # expand_ratio==1 blocks: [dw,pool,bn,relu,pw,bn]; else 9 layers
            meta = _mbv2_meta()[fi - 1]
            if meta[0] == 1:
                name = {0: "dw", 2: "bn_dw", 4: "project", 5: "bn_project"}[li]
            else:
                name = {0: "expand", 1: "bn_expand", 3: "dw", 5: "bn_dw",
                        7: "project", 8: "bn_project"}[li]
            return blk + [name]
        return parts
    if fam == "cnn_next":
        # hybrid Block/BlockGroup1 models (models.py:268-1876):
        # stem = Sequential[conv, channels_first LN]; conv_blockN = Block
        # {dwconv, norm, pwconv1, pwconv2, downsample_layer=[LN, conv]}
        if parts[0] == "stem":
            return ["stem", {"0": "conv", "1": "norm"}[parts[1]]]
        m = re.match(r"conv_block(\d+)$", parts[0])
        if m:
            rest = parts[1:]
            if rest and rest[0] == "downsample_layer":
                rest = ["downsample", {"0": "norm", "1": "conv"}[rest[1]]]
            # block labels need not be contiguous: Cnn10Next/Cnn14Next name
            # blocks conv_block11, conv_block12, conv_block21, ...
            # (models.py:1363-1372, 1791-1800); the numeric labels sort in
            # forward order, so map label -> ordinal via block_rank
            label = int(m.group(1))
            idx = block_rank[label] if block_rank else label - 1
            return ["blocks", idx] + rest
        return parts
    # cnn / sed / wavegram: paths map one-to-one (modulo the DeformableConv2d
    # submodule names, models.py:202-265)
    return [_DEFORM_MAP.get(p, p) for p in parts]


def _mbv2_meta():
    from audioset_convnext_inf_tpu.models.pann import _mbv2_block_meta

    return _mbv2_block_meta()


def _resnet_path(parts: List[str]) -> List:
    """resnet.layerL.B.xxx -> resnet.stages[L-1][B].xxx with downsample
    Sequential indices resolved (conv vs bn by position)."""
    m = re.match(r"layer(\d+)$", parts[1])
    stage = int(m.group(1)) - 1
    block = int(parts[2])
    rest = parts[3:]
    if rest and rest[0] == "downsample":
        # stride-1 downsample (stage 0): [conv(0), bn(1)]; stride-2
        # (stages 1-3): [pool(0), conv(1), bn(2)] (reference _make_layer)
        idx = int(rest[1])
        if stage == 0:
            name = {0: "conv", 1: "bn"}[idx]
        else:
            name = {1: "conv", 2: "bn"}[idx]
        return ["resnet", "stages", stage, block, "downsample", name]
    return ["resnet", "stages", stage, block] + rest


def pann_state_dict_to_params(state_dict: Dict[str, Any], cfg_or_name) -> Params:
    """Convert a reference PANN state dict into our parameter pytree."""
    cfg = PANN_REGISTRY[cfg_or_name] if isinstance(cfg_or_name, str) else cfg_or_name
    bn_prefixes = {
        k[: -len(".running_mean")] for k in state_dict if k.endswith(".running_mean")
    }
    block_rank = None
    if cfg.family == "cnn_next":
        labels = sorted({
            int(m.group(1))
            for k in state_dict
            if (m := re.match(r"conv_block(\d+)\.", k))
        })
        block_rank = {lbl: i for i, lbl in enumerate(labels)}
    params: Params = {}
    for key, raw in state_dict.items():
        if any(s in key for s in _SKIP):
            continue
        v = _to_numpy(raw)
        is_bn = key.rsplit(".", 1)[0] in bn_prefixes
        leaf, value = _transform(key, v, is_bn)
        path = _rewrite_path(cfg, key, block_rank)
        # cnn_next LayerNorms (block norm, stem LN, downsample LN) use
        # scale/bias leaves like init_layer_norm, not conv-style w/b
        if cfg.family == "cnn_next" and path and path[-1] == "norm" and not is_bn:
            leaf = _BN_MAP[key.rsplit(".", 1)[-1]]
        # normalize nested list containers ("blocks"/"stages" markers)
        norm_path: List = []
        for p in path:
            if isinstance(p, str) and p.isdigit():
                norm_path.append(int(p))
            else:
                norm_path.append(p)
        _set(params, norm_path, leaf, value)
    return params
