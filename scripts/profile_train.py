"""Per-op device-time profile of the training step on the real chip.

Prints the top-N ops with grouped attribution (forward/backward, stage,
op class) to guide backward-kernel work. See NOTES.md for the round-3
numbers this produced.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=256)
    ap.add_argument("--top", type=int, default=45)
    args = ap.parse_args()

    import jax

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, ConvNeXtConfig, FrontendConfig
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.utils.profiling import profile_ops

    cfg = ConvNeXtConfig(drop_path_rate=0.1, block_impl="xla_approx",
                         frontend=FrontendConfig(precision="high"))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    trainer = Trainer(cfg, TrainConfig(max_lr=1e-4, total_steps=75000,
                                       mixup_alpha=1.0, bf16_compute=True), params)

    rng = np.random.RandomState(0)
    b = args.batch_size
    wav = jax.device_put((rng.randn(b, CLIP_SAMPLES) * 0.1).astype(np.float32))
    tgt_np = np.zeros((b, 527), np.float32)
    tgt_np[np.arange(b), rng.randint(0, 527, b)] = 1.0
    tgt = jax.device_put(tgt_np)

    state = trainer.state

    def step(params, opt_state, wav, tgt):
        return trainer._step_fn(params, opt_state, wav, tgt, 0, trainer._key)

    import time
    t0 = time.perf_counter()
    p, o, loss = step(state.params, state.opt_state, wav, tgt)
    print(f"compile+first step: {time.perf_counter()-t0:.0f}s loss={float(loss):.3f}",
          flush=True)

    rows = profile_ops(step, state.params, state.opt_state, wav, tgt)
    total = sum(r["ms_per_iter"] for r in rows)
    print(f"total device ms/iter: {total:.1f}")
    for r in rows[: args.top]:
        print(f"{r['ms_per_iter']:8.2f}  x{r['count_per_iter']:<4} {r['name'][:100]}")


if __name__ == "__main__":
    main()
