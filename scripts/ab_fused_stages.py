"""In-process A/B of fused-stage configurations on the real TPU.

Times the FULL jitted serving model (bf16, xla_approx, frontend 'high',
B=128) under different `_FUSED_STAGE_TILES` maps, with the dependency-chained
timing methodology of bench.py (block_until_ready is a no-op through the
relay; chain via a small fold of the output into the next input and fetch
ONE scalar at the end). Standalone kernel microbenches are banned by
NOTES.md - always A/B inside the whole model.

Usage:
    python scripts/ab_fused_stages.py --iters 12 \
        --config 'base={2:(3,1),3:(1,1)}' \
        --config 's4r={2:(3,1),3:(4,1)}' \
        --config 'all={0:(4,1),1:(3,1),2:(3,1),3:(4,1)}'
"""

from __future__ import annotations

import argparse
import ast
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--config", action="append", default=[],
                    help="name={stage:(ht,mrows),...}")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import (
        CLIP_SAMPLES, ConvNeXtConfig, FrontendConfig)
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    cfg = ConvNeXtConfig(drop_path_rate=0.0, block_impl="xla_approx",
                         frontend=FrontendConfig(precision="high"))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    frontend = LogMelFrontend(cfg.frontend, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    wav0 = jax.device_put(
        (rng.randn(args.batch_size, CLIP_SAMPLES) * 0.1).astype(np.float32))

    results = {}
    for spec in args.config:
        name, _, expr = spec.partition("=")
        tiles = ast.literal_eval(expr)
        F._FUSED_STAGE_TILES = tiles

        @jax.jit
        def step(params, wav):
            probs = F.forward(params, wav, cfg, frontend=frontend,
                              compute_dtype=jnp.bfloat16)["clipwise_output"]
            return wav + 0.0 * jnp.sum(probs)

        t_c0 = time.perf_counter()
        wav = step(params, wav0)
        _ = float(jnp.sum(wav))
        compile_s = time.perf_counter() - t_c0

        t0 = time.perf_counter()
        for _ in range(args.iters):
            wav = step(params, wav)
        _ = float(jnp.sum(wav))
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name:>12}: {dt * 1e3:8.2f} ms/iter  "
              f"{args.batch_size / dt:8.1f} clips/s   "
              f"(compile+warm {compile_s:.1f}s)  tiles={tiles}", flush=True)

    best = min(results, key=results.get)
    print(f"best: {best} at {results[best] * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
