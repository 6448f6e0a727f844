"""Export an AOT serving bundle (serialized StableHLO, weights baked in).

    python -m audioset_convnext_inf_tpu.cli.export_serving OUT_DIR \
        [--model convnext_tiny] [--checkpoint PATH] [--dtype float32|bfloat16] \
        [--batch-sizes 1,16,32,128] [--kinds forward,scene,frame] [--pcm] \
        [--platforms tpu]

The bundle needs no model code or weights at serve time: deserialize with
``engine.aot_export.load_bundle`` and call it. Export on (or for, via
--platforms) the platform you will serve on - the bf16 TPU artifact bakes
in the fused Pallas kernels. See engine/aot_export.py.
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("out_dir")
    parser.add_argument("--model", default="convnext_tiny")
    parser.add_argument("--checkpoint", default=None,
                        help="local .pth/.safetensors/native checkpoint; "
                             "random init if omitted (smoke/testing)")
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"])
    parser.add_argument("--batch-sizes", default="1,16,32,128",
                        help="comma-separated fixed buckets; add 'dynamic' "
                             "for a symbolic-batch program (any B, "
                             "specializes per call shape; XLA-trunk "
                             "configs only - Pallas tiles are fixed-shape)")
    parser.add_argument("--kinds", default="forward")
    parser.add_argument("--pcm", action="store_true",
                        help="export the int16-PCM entry point")
    parser.add_argument("--num-samples", type=int, default=None,
                        help="input samples per clip (default: 320000)")
    parser.add_argument("--weights", default="baked",
                        choices=["baked", "shared"],
                        help="'baked' embeds params in every program; "
                             "'shared' stores them once in params.npz "
                             "(smaller bundles with many buckets)")
    parser.add_argument("--platforms", default=None,
                        help="comma-separated lowering platforms "
                             "(default: current backend)")
    args = parser.parse_args(argv)

    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES
    from audioset_convnext_inf_tpu.engine.aot_export import save_bundle
    from audioset_convnext_inf_tpu.models.api import ConvNeXt, create_model

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.checkpoint:
        model = ConvNeXt.from_pretrained(args.checkpoint, compute_dtype=dtype)
    else:
        model = create_model(args.model, compute_dtype=dtype)
    manifest = save_bundle(
        model,
        args.out_dir,
        batch_sizes=[b if b == "dynamic" else int(b)
                     for b in args.batch_sizes.split(",")],
        kinds=[k.strip() for k in args.kinds.split(",")],
        pcm=args.pcm,
        num_samples=args.num_samples or CLIP_SAMPLES,
        platforms=args.platforms.split(",") if args.platforms else None,
        weights=args.weights,
    )
    print(f"exported {len(manifest['entries'])} programs -> {args.out_dir} "
          f"({manifest['input_dtype']} input, platforms {manifest['platforms']})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
