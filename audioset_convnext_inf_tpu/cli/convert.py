"""Checkpoint conversion (reference convert_pytorch_ckpt_to_safetensors.py).

    python -m audioset_convnext_inf_tpu.cli.convert IN OUT \
        [--to safetensors|native] [--model NAME]

IN: torch .pth / .safetensors / native checkpoint dir.
OUT: target path (safetensors file or native checkpoint directory).

Native checkpoint directories carry their own config.json, which is used
as-is; flat .pth/.safetensors files carry no config, so ``--model`` names
the architecture they belong to (the key<->pytree mapping and the output
metadata depend on it - converting a non-tiny checkpoint without saying so
would stamp the wrong architecture).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--to", default="safetensors", choices=["safetensors", "native"])
    parser.add_argument("--model", default=None,
                        help="factory name for flat inputs with no embedded "
                             "config (default: convnext_tiny)")
    args = parser.parse_args(argv)

    from audioset_convnext_inf_tpu.checkpoint import (
        load_checkpoint,
        load_pretrained,
        save_checkpoint,
        save_safetensors,
    )

    if os.path.isdir(args.input):
        # native checkpoint: its config.json is authoritative
        state = load_checkpoint(args.input)
        params = state["params"]
        cfg = state.get("config")
        if cfg is None:
            cfg = _cfg_from_model_arg(args.model, args.input)
    else:
        cfg = _cfg_from_model_arg(args.model, args.input)
        params = load_pretrained(args.input, cfg)
    if args.to == "safetensors":
        save_safetensors(params, cfg, args.output)
    else:
        save_checkpoint(args.output, params, cfg)
    print(f"converted {args.input} -> {args.output} ({args.to})")
    return 0


def _cfg_from_model_arg(model: "str | None", input_path: str):
    import logging

    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models.api import _VARIANTS

    if model is None:
        logging.warning(
            "%s carries no config; assuming convnext_tiny (pass --model to "
            "override)", input_path)
        return ConvNeXtConfig(drop_path_rate=0.0)
    if model not in _VARIANTS:
        raise KeyError(f"unknown model {model!r}; available: {sorted(_VARIANTS)}")
    depths, dims = _VARIANTS[model]
    return ConvNeXtConfig(name=model, depths=depths, dims=dims,
                          drop_path_rate=0.0)


if __name__ == "__main__":
    raise SystemExit(main())
