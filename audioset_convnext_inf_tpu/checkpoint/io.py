"""Checkpoint IO: native JAX checkpoints + reference-format loading.

 - :func:`load_pretrained` mirrors the reference resolution order
   (convnext.py:404-511): local file -> https URL (Zenodo) -> HF hub id.
   Formats: ``.safetensors`` (flat reference state dict), ``.pth`` (torch
   pickle, either a bare state dict or ``{"model": state_dict}``), or a
   native checkpoint directory.
 - :func:`save_checkpoint` / :func:`load_checkpoint` store full training
   state (params, optimizer, sampler, config, metrics) as msgpack +
   config JSON - the TPU-native analog of main.py:816-837's ``.pth`` blobs.
 - :func:`save_safetensors` exports reference-compatible safetensors
   (the analog of convert_pytorch_ckpt_to_safetensors.py).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from audioset_convnext_inf_tpu.config import (
    ConvNeXtConfig,
    config_to_json,
    convnext_config_from_json,
)
from audioset_convnext_inf_tpu.checkpoint.convert import (
    jax_params_to_torch_state_dict,
    torch_state_dict_to_params,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Reference-format loading
# ---------------------------------------------------------------------------


def _load_safetensors_state_dict(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return load_file(path)


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` pickle without requiring a GPU torch build."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(blob, dict) and "model" in blob and isinstance(blob["model"], dict):
        blob = blob["model"]
    return {k: v.detach().cpu().numpy() for k, v in blob.items()}


def _resolve_checkpoint_path(path_or_id: str) -> str:
    """local path -> itself; https -> download to cache; else HF hub id.

    Mirrors ConvNeXt.from_pretrained resolution (convnext.py:412-493).
    """
    if os.path.exists(path_or_id):
        return path_or_id
    # A HuggingFace id is "namespace/name" (optionally "@revision"): exactly
    # one slash, no checkpoint extension, not an explicit filesystem path.
    # Anything else containing a separator or ending in a checkpoint
    # extension is a missing local path - fail fast rather than asking the
    # hub for it.
    looks_like_hf_id = (
        path_or_id.count("/") == 1
        and not path_or_id.endswith((".pth", ".safetensors"))
        and not path_or_id.startswith((".", "/", "~"))
    )
    if not path_or_id.startswith(("http://", "https://")) and not looks_like_hf_id and (
        os.sep in path_or_id or path_or_id.endswith((".pth", ".safetensors"))
    ):
        raise FileNotFoundError(
            f"checkpoint path {path_or_id!r} does not exist (pass an existing "
            "file/directory, an https URL, or a HuggingFace model id)"
        )
    if path_or_id.startswith(("http://", "https://")):
        import urllib.request

        cache = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "audioset_convnext_inf_tpu",
            "checkpoints",
        )
        os.makedirs(cache, exist_ok=True)
        fname = os.path.basename(path_or_id).replace("?download=1", "")
        dst = os.path.join(cache, fname)
        if not os.path.exists(dst):
            # download to a temp name + atomic rename: an interrupted
            # transfer must not leave a truncated file that every later
            # call trusts (save_checkpoint uses the same pattern)
            tmp = dst + ".part"
            urllib.request.urlretrieve(path_or_id, tmp)
            os.replace(tmp, dst)
        return dst
    # HuggingFace model id, optionally with @revision
    from huggingface_hub import hf_hub_download

    if "@" in path_or_id:
        model_id, revision = path_or_id.split("@", 1)
    else:
        model_id, revision = path_or_id, None
    path = hf_hub_download(
        model_id,
        "model.safetensors",
        repo_type="model",
        revision=revision,
        library_name="audioset-convnext-tpu",
    )
    try:  # courtesy config download, HF download counters (convnext.py:474-493)
        hf_hub_download(model_id, "config.yaml", repo_type="model", revision=revision)
    except Exception:
        pass
    return path


def load_pretrained(path_or_id: str, cfg: ConvNeXtConfig) -> Params:
    path = _resolve_checkpoint_path(path_or_id)
    if os.path.isdir(path):
        state = load_checkpoint(path)
        return state["params"]
    if path.endswith(".safetensors"):
        sd = _load_safetensors_state_dict(path)
    else:
        sd = _load_torch_state_dict(path)
    return torch_state_dict_to_params(sd, cfg)


def save_safetensors(params: Params, cfg: ConvNeXtConfig, path: str) -> None:
    from safetensors.numpy import save_file

    sd = jax_params_to_torch_state_dict(params, cfg)
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, path)


# ---------------------------------------------------------------------------
# Native checkpoints (training state)
# ---------------------------------------------------------------------------


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    directory: str,
    params: Params,
    cfg: Optional[ConvNeXtConfig] = None,
    opt_state: Any = None,
    bn_stats: Any = None,
    sampler_state: Any = None,
    iteration: Optional[int] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a checkpoint directory: arrays via pickle-of-numpy (portable,
    no torch), config as JSON. Returns the directory path."""
    os.makedirs(directory, exist_ok=True)
    state = {
        "params": _to_host(params),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "bn_stats": _to_host(bn_stats) if bn_stats is not None else None,
        "sampler_state": sampler_state,
        "iteration": iteration,
        "extra": extra or {},
    }
    tmp = os.path.join(directory, "state.pkl.tmp")
    with open(tmp, "wb") as f:
        pickle.dump(state, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, os.path.join(directory, "state.pkl"))
    if cfg is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            f.write(config_to_json(cfg))
    return directory


def load_checkpoint(directory: str) -> Dict[str, Any]:
    with open(os.path.join(directory, "state.pkl"), "rb") as f:
        state = pickle.load(f)
    cfg_path = os.path.join(directory, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            state["config"] = convnext_config_from_json(f.read())
    state["params"] = jax.tree_util.tree_map(jnp.asarray, state["params"])
    return state
