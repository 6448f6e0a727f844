"""Bit-exact torch <-> JAX parameter conversion for the ConvNeXt family.

Key map (reference state dict, convnext.py:145-261 -> our pytree,
models/convnext.py docstring):

    bn0.{weight,bias,running_mean,running_var} -> bn0.{scale,bias,mean,var}
    downsample_layers.0.0.*  -> stem.conv      (conv OIHW -> HWIO)
    downsample_layers.0.1.*  -> stem.norm
    downsample_layers.i.0.*  -> downsample[i-1].norm   (i in 1..3)
    downsample_layers.i.1.*  -> downsample[i-1].conv
    stages.i.j.dwconv.*      -> stages[i][j].dwconv    (OIHW (C,1,7,7) -> HWIO (7,7,1,C))
    stages.i.j.norm.*        -> stages[i][j].norm
    stages.i.j.pwconv{1,2}.* -> stages[i][j].pwconv{1,2}  (Linear (out,in) -> (in,out))
    stages.i.j.gamma         -> stages[i][j].gamma
    norm.*                   -> final_norm
    head_audioset.*          -> head               (Linear transpose)

Frontend buffers (spectrogram_extractor.*, logmel_extractor.melW,
spec_augmenter.*) are non-trainable DFT/mel constants that our frontend
recomputes analytically. ``logmel_extractor.melW`` is validated against our
analytic mel filterbank when present (a mismatch means the checkpoint was
trained with different STFT/mel parameters than the supplied config and
would silently produce wrong features); the remaining buffers are dropped.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.config import ConvNeXtConfig

Params = Dict[str, Any]

_SKIPPED_PREFIXES = (
    "spectrogram_extractor.",
    "logmel_extractor.",
    "spec_augmenter.",
    "speed_perturb.",
)


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor without importing torch at module scope
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def torch_state_dict_to_params(
    state_dict: Dict[str, Any], cfg: ConvNeXtConfig, strict: bool = True
) -> Params:
    """Convert a reference-model torch state dict into our parameter pytree.

    Accepts either raw tensors or numpy arrays as values (so safetensors
    numpy loading works without torch). Verifies completeness and shapes.
    """
    sd = {k: _to_numpy(v) for k, v in state_dict.items() if not k.endswith("num_batches_tracked")}
    if "logmel_extractor.melW" in sd:
        _validate_mel_weights(sd["logmel_extractor.melW"], cfg)
    consumed = set()

    def take(key: str) -> np.ndarray:
        if key not in sd:
            raise KeyError(f"checkpoint is missing expected key {key!r}")
        consumed.add(key)
        return sd[key]

    def conv(prefix: str) -> Dict[str, jnp.ndarray]:
        w = take(prefix + ".weight")  # OIHW
        b = take(prefix + ".bias")
        return {"w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))), "b": jnp.asarray(b)}

    def ln(prefix: str) -> Dict[str, jnp.ndarray]:
        return {
            "scale": jnp.asarray(take(prefix + ".weight")),
            "bias": jnp.asarray(take(prefix + ".bias")),
        }

    def lin(prefix: str) -> Dict[str, jnp.ndarray]:
        w = take(prefix + ".weight")  # (out, in)
        b = take(prefix + ".bias")
        return {"w": jnp.asarray(np.ascontiguousarray(w.T)), "b": jnp.asarray(b)}

    params: Params = {
        "bn0": {
            "scale": jnp.asarray(take("bn0.weight")),
            "bias": jnp.asarray(take("bn0.bias")),
            "mean": jnp.asarray(take("bn0.running_mean")),
            "var": jnp.asarray(take("bn0.running_var")),
        },
        "stem": {"conv": conv("downsample_layers.0.0"), "norm": ln("downsample_layers.0.1")},
        "downsample": [
            {"norm": ln(f"downsample_layers.{i}.0"), "conv": conv(f"downsample_layers.{i}.1")}
            for i in range(1, 4)
        ],
        "stages": [],
        "final_norm": ln("norm"),
        "head": lin("head_audioset"),
    }

    for i, depth in enumerate(cfg.depths):
        stage = []
        for j in range(depth):
            p = f"stages.{i}.{j}"
            block = {
                "dwconv": conv(f"{p}.dwconv"),
                "norm": ln(f"{p}.norm"),
                "pwconv1": lin(f"{p}.pwconv1"),
                "pwconv2": lin(f"{p}.pwconv2"),
            }
            gkey = f"{p}.gamma"
            if gkey in sd:
                block["gamma"] = jnp.asarray(take(gkey))
            stage.append(block)
        params["stages"].append(stage)

    if strict:
        leftover = [
            k
            for k in sd
            if k not in consumed and not k.startswith(_SKIPPED_PREFIXES)
        ]
        if leftover:
            raise ValueError(f"unconsumed checkpoint keys: {sorted(leftover)[:10]} ...")

    _validate_shapes(params, cfg)
    return params


def _validate_mel_weights(melW: np.ndarray, cfg: ConvNeXtConfig) -> None:
    """Check the checkpoint's mel matrix against our analytic recompute.

    torchlibrosa stores melW as (n_fft//2+1, n_mels) - the transpose of
    librosa.filters.mel. A checkpoint trained with different sr/n_fft/
    n_mels/fmin/fmax than ``cfg.frontend`` must not load silently: our
    frontend would feed the trunk differently-scaled log-mel features.
    """
    from audioset_convnext_inf_tpu.ops.frontend import mel_filterbank

    f = cfg.frontend
    ours = mel_filterbank(f.sample_rate, f.n_fft, f.n_mels, f.fmin, f.fmax).T
    if melW.shape != ours.shape:
        raise ValueError(
            f"checkpoint logmel_extractor.melW has shape {melW.shape}, but the "
            f"config's frontend ({f.n_fft=}, {f.n_mels=}) implies {ours.shape}; "
            "the checkpoint was trained with different STFT/mel parameters"
        )
    err = float(np.abs(melW.astype(np.float64) - ours.astype(np.float64)).max())
    if err > 1e-4:
        raise ValueError(
            f"checkpoint logmel_extractor.melW deviates from the analytic mel "
            f"filterbank for this config (max abs diff {err:.3e}); sr/fmin/fmax/"
            "n_mels of the checkpoint do not match cfg.frontend"
        )


def _validate_shapes(params: Params, cfg: ConvNeXtConfig) -> None:
    dims = cfg.dims
    (kh, kw), _, _ = cfg.stem_geometry()
    expect = {
        ("stem", "conv", "w"): (kh, kw, cfg.in_chans, dims[0]),
        ("final_norm", "scale"): (dims[-1],),
        ("head", "w"): (dims[-1], cfg.num_classes),
        ("bn0", "mean"): (cfg.frontend.n_mels,),
    }
    for path, shape in expect.items():
        node = params
        for k in path:
            node = node[k]
        if tuple(node.shape) != shape:
            raise ValueError(f"shape mismatch at {'.'.join(path)}: got {tuple(node.shape)}, want {shape}")


def load_imagenet_backbone(
    state_dict: Dict[str, Any], cfg: ConvNeXtConfig, params: Params
) -> Params:
    """Non-strict ImageNet ConvNeXt init (reference convnext.py:663-672).

    The reference loads a timm/FB image checkpoint with ``strict=False``
    (3-channel 4x4 stem + 1000-class head don't match) and then swaps in the
    audio stem. Here: start from ``params`` (fresh audio init incl. stem,
    bn0, head) and copy every tensor whose converted shape matches -
    i.e. the stage blocks, downsample layers and final norm.

    Accepts raw checkpoints or ``{"model": ...}`` wrappers. Returns a new
    pytree; logs nothing, skips silently like the reference's strict=False.
    """
    import copy

    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    sd = {k: _to_numpy(v) for k, v in state_dict.items() if not k.endswith("num_batches_tracked")}
    out = copy.deepcopy(params)

    def try_set(dst_parent, dst_key, value):
        cur = dst_parent.get(dst_key)
        if cur is not None and tuple(cur.shape) == tuple(value.shape):
            dst_parent[dst_key] = jnp.asarray(value)

    def conv_t(w):
        return np.transpose(w, (2, 3, 1, 0))

    for i in range(1, 4):
        if f"downsample_layers.{i}.0.weight" in sd:
            d = out["downsample"][i - 1]
            try_set(d["norm"], "scale", sd[f"downsample_layers.{i}.0.weight"])
            try_set(d["norm"], "bias", sd[f"downsample_layers.{i}.0.bias"])
            try_set(d["conv"], "w", conv_t(sd[f"downsample_layers.{i}.1.weight"]))
            try_set(d["conv"], "b", sd[f"downsample_layers.{i}.1.bias"])
    for i, depth in enumerate(cfg.depths):
        for j in range(depth):
            p = f"stages.{i}.{j}"
            if f"{p}.dwconv.weight" not in sd:
                continue
            blk = out["stages"][i][j]
            try_set(blk["dwconv"], "w", conv_t(sd[f"{p}.dwconv.weight"]))
            try_set(blk["dwconv"], "b", sd[f"{p}.dwconv.bias"])
            try_set(blk["norm"], "scale", sd[f"{p}.norm.weight"])
            try_set(blk["norm"], "bias", sd[f"{p}.norm.bias"])
            try_set(blk["pwconv1"], "w", np.ascontiguousarray(sd[f"{p}.pwconv1.weight"].T))
            try_set(blk["pwconv1"], "b", sd[f"{p}.pwconv1.bias"])
            try_set(blk["pwconv2"], "w", np.ascontiguousarray(sd[f"{p}.pwconv2.weight"].T))
            try_set(blk["pwconv2"], "b", sd[f"{p}.pwconv2.bias"])
            if f"{p}.gamma" in sd and "gamma" in blk:
                try_set(blk, "gamma", sd[f"{p}.gamma"])
    if "norm.weight" in sd:
        try_set(out["final_norm"], "scale", sd["norm.weight"])
        try_set(out["final_norm"], "bias", sd["norm.bias"])
    return out


def jax_params_to_torch_state_dict(params: Params, cfg: ConvNeXtConfig) -> Dict[str, np.ndarray]:
    """Inverse mapping, for exporting to reference-compatible safetensors
    (the analog of convert_pytorch_ckpt_to_safetensors.py)."""
    out: Dict[str, np.ndarray] = {}

    def put_conv(prefix: str, p):
        out[prefix + ".weight"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        out[prefix + ".bias"] = np.asarray(p["b"])

    def put_ln(prefix: str, p):
        out[prefix + ".weight"] = np.asarray(p["scale"])
        out[prefix + ".bias"] = np.asarray(p["bias"])

    def put_lin(prefix: str, p):
        out[prefix + ".weight"] = np.ascontiguousarray(np.asarray(p["w"]).T)
        out[prefix + ".bias"] = np.asarray(p["b"])

    out["bn0.weight"] = np.asarray(params["bn0"]["scale"])
    out["bn0.bias"] = np.asarray(params["bn0"]["bias"])
    out["bn0.running_mean"] = np.asarray(params["bn0"]["mean"])
    out["bn0.running_var"] = np.asarray(params["bn0"]["var"])
    put_conv("downsample_layers.0.0", params["stem"]["conv"])
    put_ln("downsample_layers.0.1", params["stem"]["norm"])
    for i in range(1, 4):
        put_ln(f"downsample_layers.{i}.0", params["downsample"][i - 1]["norm"])
        put_conv(f"downsample_layers.{i}.1", params["downsample"][i - 1]["conv"])
    for i, stage in enumerate(params["stages"]):
        for j, block in enumerate(stage):
            p = f"stages.{i}.{j}"
            put_conv(f"{p}.dwconv", block["dwconv"])
            put_ln(f"{p}.norm", block["norm"])
            put_lin(f"{p}.pwconv1", block["pwconv1"])
            put_lin(f"{p}.pwconv2", block["pwconv2"])
            if "gamma" in block:
                out[f"{p}.gamma"] = np.asarray(block["gamma"])
    put_ln("norm", params["final_norm"])
    put_lin("head_audioset", params["head"])
    return out
