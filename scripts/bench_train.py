"""Training-step throughput on the real chip(s). Prints ONE JSON line.

Methodology: the train step is inherently dependency-chained (step i
consumes the params/opt_state produced by step i-1), so the loop needs no
artificial fold; the loss is fetched ONCE at the end (per-step float(loss)
would sync the relay every step). Effective clips/s counts the clips the
trunk actually sees: with mixup on, a batch of B waveforms trains on B/2
mixed clips (reference paired-mixup convention) - see NOTES.md accounting.

Usage:
    python scripts/bench_train.py --batch-size 256
    python scripts/bench_train.py --batch-size 512 --remat
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=256,
                    help="waveforms per step (trunk sees half under mixup)")
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize blocks in the backward (fits B>=512)")
    ap.add_argument("--fused-train", action="store_true",
                    help="stages 3-4 through the fused forward+backward "
                         "Pallas kernels (cfg.fused_train_blocks)")
    ap.add_argument("--no-mixup", action="store_true")
    ap.add_argument("--block-impl", default="xla_approx",
                    choices=["xla_approx", "xla"])
    ap.add_argument("--frontend-precision", default="high",
                    choices=["highest", "high"],
                    help="DFT/mel matmul precision; 'high' (bf16x3) is the "
                         "bf16-training default, 'highest' the f32 parity "
                         "recipe")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, ConvNeXtConfig
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import convnext as F

    mixup_alpha = 0.0 if args.no_mixup else 1.0
    from audioset_convnext_inf_tpu.config import FrontendConfig

    # bf16 training pairs with frontend precision "high" (bf16x3): its
    # residual DFT error sits below the bf16 trunk's own rounding and the
    # B-waveform frontend at "highest" costs ~15 ms/step at B=256
    cfg = ConvNeXtConfig(drop_path_rate=0.1, block_impl=args.block_impl,
                         remat_blocks=args.remat,
                         fused_train_blocks=args.fused_train,
                         frontend=FrontendConfig(precision=args.frontend_precision))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(
        cfg,
        TrainConfig(max_lr=1e-4, total_steps=75000, mixup_alpha=mixup_alpha,
                    bf16_compute=True),
        params,
    )

    rng = np.random.RandomState(0)
    b = args.batch_size
    wav = jax.device_put((rng.randn(b, CLIP_SAMPLES) * 0.1).astype(np.float32))
    tgt_np = np.zeros((b, 527), np.float32)
    tgt_np[np.arange(b), rng.randint(0, 527, b)] = 1.0
    tgt = jax.device_put(tgt_np)

    state = trainer.state
    step_fn = trainer._step_fn
    key = trainer._key

    # warm-up/compile + one forced completion
    p, o, loss = step_fn(state.params, state.opt_state, wav, tgt, 0, key)
    _ = float(loss)

    t0 = time.perf_counter()
    for i in range(args.iters):
        p, o, loss = step_fn(p, o, wav, tgt, i + 1, key)
    _ = float(loss)  # single scalar fetch closes the chain
    dt = (time.perf_counter() - t0) / args.iters

    eff = b // 2 if mixup_alpha > 0 else b
    print(json.dumps({
        "metric": "train_eff_clips_per_sec_per_chip",
        "value": round(eff / dt, 2),
        "unit": "eff clips/s/chip",
        "vs_baseline": None,
        "detail": {
            "step_ms": round(dt * 1e3, 1),
            "waveforms_per_step": b,
            "effective_clips_per_step": eff,
            "mixup": mixup_alpha > 0,
            "remat_blocks": args.remat,
            "fused_train_blocks": args.fused_train,
            "block_impl": args.block_impl,
            "frontend_precision": args.frontend_precision,
            "iters": args.iters,
        },
    }))


if __name__ == "__main__":
    main()
