"""Benchmark: batched 10-s clip tagging throughput on the local chip(s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver target of 5,000 clips/s on a v5e-8 = 625 clips/s/chip
(BASELINE.md). The reference publishes no throughput numbers.

Timing methodology: on the remote-relay TPU platform ``block_until_ready``
does not actually block, so iterations are dependency-chained (each step's
input folds in a scalar of the previous output) and the loop ends with one
scalar device->host fetch - wall time then covers the full chain.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--iters", type=int, default=48,
                        help="48 keeps run-to-run scatter ~0.5%%; 24-iter "
                             "runs scatter +-1.5%% through the relay")
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"])
    parser.add_argument("--block-impl", default="xla_approx",
                        choices=["xla_approx", "xla"])
    parser.add_argument("--frontend-precision", default="default",
                        choices=["highest", "high", "default"],
                        help="bf16 serving default 'default' (single-pass bf16 "
                             "DFT/mel GEMMs): certified at mAP delta 0.0 / top-1 "
                             "1.0 on trained weights (SERVING_PARITY_r04.json); "
                             "'high' is the bf16x3 middle ground; f32 parity "
                             "evaluation uses 'highest'")
    args = parser.parse_args()

    import sys

    def progress(msg: str) -> None:
        # stderr + flush: stdout must stay ONE JSON line, but a relay stall
        # must still leave a diagnostic tail (round-4 MULTICHIP lesson).
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, ConvNeXtConfig, FrontendConfig
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend
    from audioset_convnext_inf_tpu.parallel.mesh import batch_sharding, get_mesh

    n_chips = len(jax.devices())
    progress(f"devices: {n_chips}x {jax.devices()[0].platform}")
    mesh = get_mesh()
    sharding = batch_sharding(mesh)
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # tanh-GELU serving impls assume bf16-class numerics
    block_impl = args.block_impl if args.dtype == "bfloat16" else "xla"

    fe_precision = args.frontend_precision if args.dtype == "bfloat16" else "highest"
    cfg = ConvNeXtConfig(
        drop_path_rate=0.0,
        block_impl=block_impl,
        frontend=FrontendConfig(precision=fe_precision),
    )
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    frontend = LogMelFrontend(cfg.frontend, compute_dtype=compute_dtype)

    def step(params, wav):
        probs = F.forward(params, wav, cfg, frontend=frontend, compute_dtype=compute_dtype)[
            "clipwise_output"
        ]
        # fold output back into input: forces sequential execution of the
        # chain. One-element update on a DONATED buffer so the fold is an
        # in-place write, not a full (B, 320k) rewrite - the old
        # `wav + 0.0*sum(probs)` charged ~0.5 ms/iter of pure harness
        # traffic to every config (round-4 profile).
        return wav.at[0, 0].add(0.0 * jnp.sum(probs))

    # shardings propagate from the device_put input (explicit in_shardings
    # is pathologically slow through the remote relay - see NOTES.md)
    step = jax.jit(step, donate_argnums=(1,))
    if n_chips > 1:
        from audioset_convnext_inf_tpu.parallel.mesh import replicate

        params = jax.device_put(params, replicate(mesh))

    b = args.batch_size * n_chips
    rng = np.random.RandomState(0)
    wav = jax.device_put((rng.randn(b, CLIP_SAMPLES) * 0.1).astype(np.float32), sharding)

    # warmup/compile + sync
    progress(f"params+input on device; compiling step (B={b}, {args.dtype}, "
             f"{block_impl}, frontend={fe_precision})...")
    wav = step(params, wav)
    _ = float(jnp.sum(wav))
    progress(f"compile+warmup done; timing {args.iters} chained iters...")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        wav = step(params, wav)
    _ = float(jnp.sum(wav))  # single scalar fetch closes the chain
    dt = (time.perf_counter() - t0) / args.iters
    progress(f"timing done: {dt*1e3:.1f} ms/iter")

    clips_per_sec = b / dt
    per_chip = clips_per_sec / n_chips
    baseline_per_chip = 5000.0 / 8.0

    # MFU diagnostic (round-2 VERDICT): XLA cost analysis FLOPs of the step
    # vs v5e bf16 peak (197 TF/s/chip; measured big-GEMM ceiling is ~93% of
    # that, NOTES.md). A VPU-bound depthwise model cannot approach 1.0 -
    # report it anyway so rounds track it.
    mfu = gflops_per_clip = None
    if args.dtype == "bfloat16":
        try:
            from audioset_convnext_inf_tpu.utils.profiling import count_flops

            flops = count_flops(step, params, wav).get("flops")
            if flops:
                gflops_per_clip = flops / b / 1e9
                mfu = flops / b * per_chip / 197e12
        except Exception:
            pass
    print(
        json.dumps(
            {
                "metric": "10s_clips_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(per_chip / baseline_per_chip, 3),
                "detail": {
                    "total_clips_per_sec": round(clips_per_sec, 2),
                    "n_chips": n_chips,
                    "batch_per_chip": args.batch_size,
                    "dtype": args.dtype,
                    "block_impl": block_impl,
                    "frontend_precision": fe_precision,
                    "iters": args.iters,
                    "gflops_per_clip": round(gflops_per_clip, 1) if gflops_per_clip else None,
                    "mfu_vs_bf16_peak": round(mfu, 3) if mfu else None,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
