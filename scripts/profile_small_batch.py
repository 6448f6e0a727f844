"""Where does small-batch serving latency go? (round-5 VERDICT item 7)

B=1 runs 1.87 ms vs B=128's 0.62 ms/clip (LATENCY_r04.json) - ~3x worse
per clip. This prints the per-op device-time table at B in --batches
(default 1, 4) in the exact bf16 serving config so the gap is attributed
op-by-op (MXU under-tiling vs VPU dwconv vs frontend vs overhead) instead
of guessed. Findings land in NOTES.md.

Run:  cd /root/repo && python scripts/profile_small_batch.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 4])
    ap.add_argument("--top", type=int, default=18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import (
        CLIP_SAMPLES,
        ConvNeXtConfig,
        FrontendConfig,
    )
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend
    from audioset_convnext_inf_tpu.utils.profiling import profile_ops

    cfg = ConvNeXtConfig(drop_path_rate=0.0, block_impl="xla_approx",
                         frontend=FrontendConfig(precision="default"))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    frontend = LogMelFrontend(cfg.frontend, compute_dtype=jnp.bfloat16)

    def fwd(params, wav):
        return F.forward(params, wav, cfg, frontend=frontend,
                         compute_dtype=jnp.bfloat16)["clipwise_output"]

    rng = np.random.RandomState(0)
    for b in args.batches:
        wav = jax.device_put((rng.randn(b, CLIP_SAMPLES) * 0.1).astype(np.float32))
        rows = profile_ops(fwd, params, wav, iters=8)
        total = sum(r["ms_per_iter"] for r in rows)
        print(f"\n== B={b}: total device {total:.3f} ms/iter "
              f"({total / b:.3f} ms/clip) ==", flush=True)
        for r in rows[: args.top]:
            print(f"  {r['ms_per_iter']:7.3f} ms  x{r['count_per_iter']:<4}"
                  f" {r['category']:<12} {r['name'][:70]}", flush=True)
        print(json.dumps({"batch": b, "total_ms": round(total, 3),
                          "ms_per_clip": round(total / b, 4)}), flush=True)


if __name__ == "__main__":
    main()
