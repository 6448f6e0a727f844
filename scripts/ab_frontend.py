"""In-process A/B of frontend DFT implementations on the real TPU.

Times the FULL jitted serving model (bf16, xla_approx, fused stages, B=128)
under different `dft_impl` / `precision` settings, with bench.py's
dependency-chained timing (NOTES.md: never trust standalone op
microbenchmarks through the relay).

Usage:
    python scripts/ab_frontend.py --iters 24 \
        --config conv:high --config rfft:high --config direct:high
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--config", action="append", default=[],
                    help="dft_impl:precision, e.g. conv:high")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import (
        CLIP_SAMPLES, ConvNeXtConfig, FrontendConfig)
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    rng = np.random.RandomState(0)
    wav0 = jax.device_put(
        (rng.randn(args.batch_size, CLIP_SAMPLES) * 0.1).astype(np.float32))

    params = None
    results = {}
    for spec in args.config or ["conv:high", "rfft:high"]:
        impl, _, prec = spec.partition(":")
        cfg = ConvNeXtConfig(
            drop_path_rate=0.0, block_impl="xla_approx",
            frontend=FrontendConfig(precision=prec or "high", dft_impl=impl))
        if params is None:
            params = F.init_params(jax.random.PRNGKey(0), cfg)
        frontend = LogMelFrontend(cfg.frontend, compute_dtype=jnp.bfloat16)

        @jax.jit
        def step(params, wav, cfg=cfg, frontend=frontend):
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
        results[spec] = dt
        print(f"{spec:>16}: {dt * 1e3:7.1f} ms/iter "
              f"({args.batch_size / dt:7.1f} clips/s)  [compile {compile_s:.0f}s]",
              flush=True)

    best = min(results, key=results.get)
    print(f"best: {best} at {results[best] * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
