"""Transfer-learning certificate on real TPU (round 4).

Drives ``engine/transfer.py::TransferTrainer`` - the rebuild of the
reference's AudioCaps finetune loop (finetune_audiocaps.py:74-226: frozen
Cnn14 trunk, trainable fc1 + fc_audioset, Adam(amsgrad) 1e-4, BCE) - on
the chip with a synthetic 8-class tone task:

  1. head-only finetune must LEARN (loss drops, train mAP rises);
  2. every frozen trunk WEIGHT must be BIT-IDENTICAL after training, while
     the BN running stats must have ADAPTED (the reference keeps the frozen
     base in train mode, finetune_audiocaps.py:186, so BN buffers keep
     updating - merge_bn_stats is our functional analog);
  3. the trainable head leaves must have moved.

Writes TRANSFER_r04.json at the repo root and prints one JSON line.

Run:  cd /root/repo && python scripts/transfer_cert_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, N = 32000, 32000  # 1-s clips keep relay H2D negligible
N_CLS, STEPS, BATCH = 8, 300, 32  # 80 steps reached mAP 0.83; 300 clears 0.9


def main() -> None:
    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from audioset_convnext_inf_tpu.engine.transfer import TransferTrainer
    from audioset_convnext_inf_tpu.models.pann import create_pann_model

    backend = jax.default_backend()
    rng = np.random.RandomState(0)
    t = np.arange(N) / SR
    clips, tags = [], []
    for k in range(N_CLS):
        for _ in range(16):
            f0 = 220.0 * (k + 1)
            wav = (0.4 + 0.2 * rng.rand()) * np.sin(2 * np.pi * f0 * t + rng.rand() * 6)
            clips.append((wav + 0.03 * rng.randn(N)).astype(np.float32))
            tg = np.zeros(527, np.float32)
            tg[k] = 1.0
            tags.append(tg)
    clips, tags = np.stack(clips), np.stack(tags)

    model = create_pann_model("Cnn14", seed=0)
    trainer = TransferTrainer(model, learning_rate=1e-3)
    frozen_before = {
        k: jax.tree_util.tree_map(np.asarray, v)
        for k, v in model.params.items() if k not in ("fc1", "fc_audioset")
    }
    head_before = np.asarray(model.params["fc_audioset"]["w"]).copy()

    order = np.random.RandomState(1)
    losses = []
    t0 = time.perf_counter()
    for s in range(STEPS):
        idx = order.permutation(len(clips))[:BATCH]
        losses.append(trainer.step(clips[idx], tags[idx]))
    train_s = time.perf_counter() - t0

    # learning + freeze checks
    out = np.asarray(model.forward(clips)["clipwise_output"])
    from audioset_convnext_inf_tpu.engine.metrics import evaluate_clipwise

    stats = evaluate_clipwise(out, tags)
    train_map = float(np.nanmean(stats["average_precision"][:N_CLS]))

    # Frozen-trunk audit: weights (w/b/scale/bias) must be bit-identical;
    # BN running stats (mean/var) are buffers and MUST have adapted, like
    # the reference's train-mode frozen base (finetune_audiocaps.py:186).
    frozen_ok, bn_adapted = True, False
    for k, before in frozen_before.items():
        bpaths, _ = jax.tree_util.tree_flatten_with_path(before)
        apaths, _ = jax.tree_util.tree_flatten_with_path(
            jax.tree_util.tree_map(np.asarray, model.params[k]))
        for (pth, a), (_, b) in zip(bpaths, apaths):
            leaf = pth[-1].key if hasattr(pth[-1], "key") else str(pth[-1])
            if leaf in ("mean", "var"):
                bn_adapted |= not np.array_equal(a, b)
            else:
                frozen_ok &= np.array_equal(a, b)
    head_moved = not np.array_equal(
        np.asarray(model.params["fc_audioset"]["w"]),
        np.asarray(head_before))

    loss0, loss1 = float(np.mean(losses[:8])), float(np.mean(losses[-8:]))
    result = {
        "metric": "transfer_finetune_tpu",
        "value": round(train_map, 4),
        "unit": "train mAP (8 synthetic classes)",
        "pass": bool(loss1 < 0.25 * loss0 and train_map > 0.9 and frozen_ok
                     and bn_adapted and head_moved),
        "detail": {
            "backend": backend,
            "model": "Cnn14 (79.7M params), head-only finetune (fc1 + fc_audioset)",
            "steps": STEPS, "batch": BATCH,
            "loss_first8_mean": round(loss0, 4),
            "loss_last8_mean": round(loss1, 4),
            "train_map": round(train_map, 4),
            "frozen_weights_bit_identical": bool(frozen_ok),
            "bn_running_stats_adapted": bool(bn_adapted),
            "head_weights_moved": bool(head_moved),
            "train_seconds": round(train_s, 1),
            "reference": "finetune_audiocaps.py:74-226 (Transfer_Cnn)",
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "TRANSFER_r04.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
