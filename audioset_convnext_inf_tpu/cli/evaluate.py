"""AudioSet batch evaluation (reference evaluate_convnext_on_audioset.py).

    python -m audioset_convnext_inf_tpu.cli.evaluate \
        --checkpoint ckpt.safetensors \
        --eval-indexes eval_indexes.h5 [--bal-indexes bal_indexes.h5] \
        [--batch-size 256] [--num-workers 10]

Reproduces the published protocol: batched forward over the balanced-train
and eval HDF5 index sets, prints mAP / AUC / d-prime per subset.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", required=True)
    parser.add_argument("--eval-indexes", required=True)
    parser.add_argument("--bal-indexes", default=None)
    parser.add_argument("--batch-size", type=int, default=256)
    parser.add_argument("--num-workers", type=int, default=10)
    parser.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    parser.add_argument("--keep-int16", action="store_true",
                        help="ship packed int16 to the device and decode on-chip "
                             "(halves H2D bandwidth; identical probabilities)")
    args = parser.parse_args(argv)

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.data import AudioSetDataset, DataLoader, EvaluateSampler
    from audioset_convnext_inf_tpu.engine import Evaluator, summarize
    from audioset_convnext_inf_tpu.models import ConvNeXt

    model = ConvNeXt.from_pretrained(
        args.checkpoint,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )
    print(f"# params: {model.count_parameters()}")
    evaluator = Evaluator(model.params, model.cfg, compute_dtype=model.compute_dtype)

    def run(tag: str, index_path: str) -> None:
        loader = DataLoader(
            AudioSetDataset(keep_int16=args.keep_int16),
            EvaluateSampler(index_path, args.batch_size),
            num_workers=args.num_workers,
            pad_to_batch_size=args.batch_size,
        )
        t0 = time.time()
        stats = evaluator.evaluate(loader)
        s = summarize(stats)
        print(
            f"{tag}: mAP: {s['mAP']:.6f}, AUC: {s['mAUC']:.6f}, "
            f"d-prime: {s['dprime']:.6f}  ({time.time() - t0:.1f}s)"
        )

    if args.bal_indexes:
        run("Balanced train", args.bal_indexes)
    run("Eval", args.eval_indexes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
