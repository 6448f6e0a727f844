"""Checkpoint conversion (reference convert_pytorch_ckpt_to_safetensors.py).

    python -m audioset_convnext_inf_tpu.cli.convert IN OUT \
        [--to safetensors|native]

IN: torch .pth / .safetensors / native checkpoint dir.
OUT: target path (safetensors file or native checkpoint directory).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input")
    parser.add_argument("output")
    parser.add_argument("--to", default="safetensors", choices=["safetensors", "native"])
    args = parser.parse_args(argv)

    from audioset_convnext_inf_tpu.checkpoint import (
        load_pretrained,
        save_checkpoint,
        save_safetensors,
    )
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig

    cfg = ConvNeXtConfig(drop_path_rate=0.0)
    params = load_pretrained(args.input, cfg)
    if args.to == "safetensors":
        save_safetensors(params, cfg, args.output)
    else:
        save_checkpoint(args.output, params, cfg)
    print(f"converted {args.input} -> {args.output} ({args.to})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
