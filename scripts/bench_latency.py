"""Small-batch serving LATENCY on the real chip. Prints ONE JSON line.

Complements bench.py (large-batch throughput): an inference service cares
about the per-request wall time at small batch. Reports per-batch latency
for B in --batches (default 1, 16, 32) in the bf16 serving config.

Methodology: same dependency-chained timing as bench.py (block_until_ready
is a no-op through the relay; chain via folding a scalar of the output into
the next input, fetch once at the end). Note B=1/B<16 falls back to the
unfused XLA path (fused kernels need batch % 16 == 0) - that IS the serving
behavior, so it is what we measure.
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
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 16, 32])
    ap.add_argument("--iters", type=int, default=48)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, ConvNeXtConfig, FrontendConfig
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    cfg = ConvNeXtConfig(drop_path_rate=0.0, block_impl="xla_approx",
                         frontend=FrontendConfig(precision="default"))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    frontend = LogMelFrontend(cfg.frontend, compute_dtype=jnp.bfloat16)

    @jax.jit
    def step(params, wav):
        probs = F.forward(params, wav, cfg, frontend=frontend,
                          compute_dtype=jnp.bfloat16)["clipwise_output"]
        return wav + 0.0 * jnp.sum(probs)

    rng = np.random.RandomState(0)
    results = {}
    for b in args.batches:
        wav = jax.device_put(
            (rng.randn(b, CLIP_SAMPLES) * 0.1).astype(np.float32))
        wav = step(params, wav)  # compile + warm
        _ = float(jnp.sum(wav))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            wav = step(params, wav)
        _ = float(jnp.sum(wav))
        dt = (time.perf_counter() - t0) / args.iters
        results[f"b{b}_ms"] = round(dt * 1e3, 2)

    print(json.dumps({
        "metric": "serving_latency_b1_ms",
        "value": results.get("b1_ms"),
        "unit": "ms/request",
        "vs_baseline": None,
        "detail": dict(results, iters=args.iters, dtype="bfloat16",
                       block_impl="xla_approx"),
    }))


if __name__ == "__main__":
    main()
