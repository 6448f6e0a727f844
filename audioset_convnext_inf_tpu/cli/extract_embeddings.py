"""Per-file logit/embedding extraction (reference extract_embeddings.py).

    python -m audioset_convnext_inf_tpu.cli.extract_embeddings \
        --checkpoint ckpt --out embeddings.h5 [--kind logits|scene] DIR_OR_WAVS...

Walks directories for .wav files (sorted), forwards each, stores one vector
per file id in the output HDF5.
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("inputs", nargs="+", help="wav files or directories")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--out", required=True)
    parser.add_argument("--kind", default="logits", choices=["logits", "scene"])
    args = parser.parse_args(argv)

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.engine.infer import extract_embeddings_to_hdf5
    from audioset_convnext_inf_tpu.models import ConvNeXt, convnext_tiny

    paths = []
    for inp in args.inputs:
        if os.path.isdir(inp):
            for root, _, files in os.walk(inp):
                paths.extend(os.path.join(root, f) for f in sorted(files) if f.endswith(".wav"))
        else:
            paths.append(inp)

    if args.checkpoint:
        model = ConvNeXt.from_pretrained(args.checkpoint)
    else:
        model = convnext_tiny(drop_path_rate=0.0)
        print("WARNING: no checkpoint given - using random weights")

    n = extract_embeddings_to_hdf5(model, paths, args.out, kind=args.kind)
    print(f"wrote {n}/{len(paths)} vectors to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
