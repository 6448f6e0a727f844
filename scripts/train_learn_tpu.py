"""Prove the production training recipe LEARNS at the real flagship
geometry, on real TPU hardware.

tests/test_trainer.py::test_recipe_overfits_synthetic_tones certifies the
recipe wiring (mixup pairing, bn0 batch-stat flow, WD groups, OneCycle,
SpecAugment, DropPath) on a reduced model under CPU. This script runs the
same certification at the reference's own scale: the FULL convnext_tiny
(28.2M params, dims 96..768), 10-second 32 kHz clips, the production bf16
training configuration (bf16 compute + tanh-GELU blocks + frontend "high",
the measured-fastest recipe in NOTES.md), overfitting 64 synthetic tone
clips (16 classes x 4) and reporting train mAP through the *serving* eval
path (bf16 + fused Mosaic stage kernels).

Mirrors the reference's train loop semantics (main.py:117-923) end to end:
logmel-domain mixup with paired targets, AdamW with custom WD groups
(pytorch_utils.py:39-53), OneCycleLR (main.py:659-660).

Relay-aware: the waveform bank is device_put ONCE and batches are gathered
on device from a (B,) index array (per-step H2D of 40 MB of waveforms
would measure the tunnel, not the trainer); losses are fetched in one
batched D2H at the end (per-step scalar fetches sync the relay).

Writes TRAIN_LEARN_r03.json at the repo root and prints one JSON line.

Run:  cd /root/repo && python scripts/train_learn_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.config import (
        AugmentConfig, ConvNeXtConfig, FrontendConfig, SpecAugmentConfig)
    from audioset_convnext_inf_tpu.engine.metrics import evaluate_clipwise
    from audioset_convnext_inf_tpu.engine.trainer import (
        TrainConfig, make_optimizer, make_train_step)
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    backend = jax.default_backend()

    # --- data: 64 ten-second tone clips, 16 classes x 4 ------------------
    sr, n = 32000, 320000
    n_cls, per_cls = 16, 4
    n_clips = n_cls * per_cls
    freqs = 130.0 * (2.0 ** (np.arange(n_cls) / 2.1))  # 130 Hz .. ~18 kHz
    class_idx = [7 * (k + 1) for k in range(n_cls)]
    data_rng = np.random.RandomState(0)
    t = np.arange(n) / sr
    clips, targets = [], []
    for k in range(n_cls):
        for _ in range(per_cls):
            wav = (0.5 + 0.3 * data_rng.rand()) * np.sin(
                2 * np.pi * freqs[k] * t + data_rng.rand() * 2 * np.pi)
            clips.append((wav + 0.05 * data_rng.randn(n)).astype(np.float32))
            tg = np.zeros(527, np.float32)
            tg[class_idx[k]] = 1.0
            targets.append(tg)
    clips, targets = np.stack(clips), np.stack(targets)

    # --- the production training recipe at flagship geometry -------------
    steps, batch = 400, 32  # mixup pairs: trunk batch 16
    cfg = ConvNeXtConfig(
        drop_path_rate=0.1,
        block_impl="xla_approx",
        frontend=FrontendConfig(precision="high"),
        augment=AugmentConfig(use_spec_augment=True,
                              spec_augment=SpecAugmentConfig()),
    )
    tcfg = TrainConfig(max_lr=1.5e-3, total_steps=steps, mixup_alpha=1.0,
                       weight_decay=0.01, seed=7, bf16_compute=True)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(params, tcfg)
    opt_state = tx.init(params)
    step_fn = make_train_step(cfg, tcfg, tx)
    key = jax.random.PRNGKey(tcfg.seed)

    bank = jax.device_put(clips)
    tgt_bank = jax.device_put(targets)

    order = np.random.RandomState(42)
    t0 = time.perf_counter()
    losses = []
    for s in range(steps):
        idx = jnp.asarray(order.permutation(n_clips)[:batch])
        wav = jnp.take(bank, idx, axis=0)
        tgt = jnp.take(tgt_bank, idx, axis=0)
        params, opt_state, loss = step_fn(params, opt_state, wav, tgt, s, key)
        losses.append(loss)
        if s in (0, 49):  # bound the dispatch queue + surface compile time
            print(f"step {s}: loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s elapsed)", flush=True)
    losses = np.asarray(jnp.stack(losses))  # ONE D2H for the loss history
    train_s = time.perf_counter() - t0
    assert np.isfinite(losses).all(), "non-finite loss"

    # --- train mAP through the SERVING eval path (bf16 + fused kernels) --
    out = F.forward(
        params, bank, cfg,
        frontend=LogMelFrontend(cfg.frontend, compute_dtype=jnp.bfloat16),
        compute_dtype=jnp.bfloat16,
    )
    probs = np.asarray(out["clipwise_output"], np.float32)
    stats = evaluate_clipwise(probs, targets)
    ap = stats["average_precision"][class_idx]
    train_map = float(np.mean(ap))

    loss_drop = float(np.mean(losses[-10:]) / np.mean(losses[:10]))
    result = {
        "metric": "train_recipe_overfit_map_real_geometry",
        "value": round(train_map, 4),
        "unit": "train mAP (16 synthetic classes)",
        "pass": bool(train_map > 0.9 and loss_drop < 0.1),
        "detail": {
            "backend": backend,
            "model": "convnext_tiny dims 96-768, 28.2M params, 10 s clips",
            "recipe": "bf16 + xla_approx + frontend 'high' + mixup + SpecAugment "
                      "+ DropPath 0.1 + AdamW WD-groups + OneCycle",
            "steps": steps,
            "batch_waveforms": batch,
            "n_clips": n_clips,
            "n_classes": n_cls,
            "loss_first10_mean": round(float(np.mean(losses[:10])), 4),
            "loss_last10_mean": round(float(np.mean(losses[-10:])), 4),
            "loss_drop_ratio": round(loss_drop, 4),
            "eval_path": "serving bf16 + fused Mosaic stage kernels",
            "train_seconds": round(train_s, 1),
            "per_class_ap_min": round(float(np.min(ap)), 4),
        },
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "TRAIN_LEARN_r03.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
