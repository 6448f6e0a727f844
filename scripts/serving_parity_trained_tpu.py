"""Serving-config mAP parity with TRAINED flagship weights, on real TPU.

Round-3's SERVING_PARITY artifact (scripts/serving_parity_tpu.py) used
random-init weights over 64 clips: reference-side mAP 0.169 is near chance,
so rank structure is fragile and the measurement's discriminating power is
limited (round-3 VERDICT weak #1). This script closes that gap:

 1. trains the FULL convnext_tiny (28.2M params, dims 96..768) on TPU with
    the production recipe (bf16 + tanh-GELU blocks + frontend "high" +
    mixup + SpecAugment + DropPath + AdamW WD-groups + OneCycle), 400
    steps over 64 synthetic tone clips (16 classes x 4) -- the same
    certified-learning run as scripts/train_learn_tpu.py;
 2. reverse-converts the trained params into the reference's own model via
    checkpoint/convert.py::jax_params_to_torch_state_dict (the converter's
    export direction, exercised here on REAL trained weights end to end);
 3. evaluates BOTH pipelines on 256 HELD-OUT clips (16 per class, new
    phases/amplitudes/noise): the reference's torch f32 pipeline
    (reference convnext.py:287-329 forward + evaluate.py:22-60 metric
    math) on host vs our production serving config (bf16 + xla_approx +
    fused stage-3/4 Mosaic kernels + frontend "high") on the TPU.

Trained weights give decisive logits and realistic bn0/layer-scale
magnitudes, so mAP and rank agreement measured here are meaningful
certificates, not near-chance noise.

Writes SERVING_PARITY_r04.json at the repo root and prints one JSON line.

Run:  cd /root/repo && python scripts/serving_parity_trained_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SR, N_SAMPLES = 32000, 320000
N_CLS, CLASS_IDX = 16, [7 * (k + 1) for k in range(16)]
FREQS = 130.0 * (2.0 ** (np.arange(N_CLS) / 2.1))  # 130 Hz .. ~18 kHz


def make_tone_clips(per_cls: int, seed: int):
    """Tone clips for the 16 synthetic classes: random phase/amplitude +
    5% noise. Same generative family as scripts/train_learn_tpu.py."""
    rng = np.random.RandomState(seed)
    t = np.arange(N_SAMPLES) / SR
    clips, targets = [], []
    for k in range(N_CLS):
        for _ in range(per_cls):
            wav = (0.5 + 0.3 * rng.rand()) * np.sin(
                2 * np.pi * FREQS[k] * t + rng.rand() * 2 * np.pi)
            clips.append((wav + 0.05 * rng.randn(N_SAMPLES)).astype(np.float32))
            tg = np.zeros(527, np.float32)
            tg[CLASS_IDX[k]] = 1.0
            targets.append(tg)
    return np.stack(clips), np.stack(targets)


def train_flagship(cfg, steps: int = 400, batch: int = 32):
    """The certified-learning run of scripts/train_learn_tpu.py, returning
    the trained params (f32 pytree)."""
    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.engine.trainer import (
        TrainConfig, make_optimizer, make_train_step)
    from audioset_convnext_inf_tpu.models import convnext as F

    clips, targets = make_tone_clips(per_cls=4, seed=0)
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
        idx = jnp.asarray(order.permutation(len(clips))[:batch])
        wav = jnp.take(bank, idx, axis=0)
        tgt = jnp.take(tgt_bank, idx, axis=0)
        params, opt_state, loss = step_fn(params, opt_state, wav, tgt, s, key)
        losses.append(loss)
        if s in (0, 49):
            print(f"train step {s}: loss {float(loss):.4f} "
                  f"({time.perf_counter() - t0:.0f}s elapsed)", flush=True)
    losses = np.asarray(jnp.stack(losses))
    assert np.isfinite(losses).all(), "non-finite loss"
    print(f"trained {steps} steps in {time.perf_counter() - t0:.0f}s; "
          f"loss {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}",
          flush=True)
    return params, float(np.mean(losses[-10:]))


def main() -> None:
    import torch

    from tests.reference_shim import load_reference_modules

    ref_convnext, _ref_evaluate, ref_pytorch_utils = load_reference_modules()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.checkpoint.convert import (
        jax_params_to_torch_state_dict)
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig, FrontendConfig
    from audioset_convnext_inf_tpu.engine import metrics as M
    from audioset_convnext_inf_tpu.engine.evaluator import Evaluator
    from audioset_convnext_inf_tpu.parallel.mesh import get_mesh

    backend = jax.default_backend()
    assert backend in ("tpu", "axon"), (
        f"this script certifies the real Mosaic kernels; backend is {backend!r}"
    )

    # --- phase 1: train the flagship on TPU -------------------------------
    from audioset_convnext_inf_tpu.config import AugmentConfig, SpecAugmentConfig

    train_cfg = ConvNeXtConfig(
        drop_path_rate=0.1,
        block_impl="xla_approx",
        frontend=FrontendConfig(precision="high"),
        augment=AugmentConfig(use_spec_augment=True,
                              spec_augment=SpecAugmentConfig()),
    )
    params, final_loss = train_flagship(train_cfg)
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)

    # --- phase 2: export into the reference's own model -------------------
    sd = jax_params_to_torch_state_dict(params, train_cfg)
    torch.manual_seed(0)
    model = ref_convnext.convnext_tiny(
        pretrained=False, strict=False, drop_path_rate=0.0,
        after_stem_dim=[252, 56])
    load = model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not load.unexpected_keys, load.unexpected_keys
    # only frontend buffers (recomputed analytically on our side) and
    # bookkeeping counters may be missing from the export
    bad_missing = [k for k in load.missing_keys
                   if not (k.startswith(("spectrogram_extractor",
                                         "logmel_extractor", "spec_augmenter"))
                           or k.endswith("num_batches_tracked"))]
    assert not bad_missing, bad_missing
    model.eval()

    # --- phase 3: 256 held-out clips through both pipelines ---------------
    n_clips, batch = 256, 32
    wav, tgt = make_tone_clips(per_cls=n_clips // N_CLS, seed=123)
    loader = [
        {"waveform": wav[i: i + batch], "target": tgt[i: i + batch]}
        for i in range(0, n_clips, batch)
    ]

    t0 = time.perf_counter()
    ref_out = ref_pytorch_utils.forward(model, loader, return_target=True)
    ref_s = time.perf_counter() - t0
    ref_stats = M.evaluate_clipwise(ref_out["clipwise_output"], ref_out["target"])
    map_ref = float(np.nanmean(ref_stats["average_precision"]))
    auc_ref = float(np.nanmean(ref_stats["auc"]))

    # both serving frontend precisions, same trained weights, same clips:
    # "high" (bf16x3 DFT/mel GEMMs) and "default" (single-pass bf16, ~6%
    # faster whole-model - adopted as the bf16 serving default in round 4
    # on the strength of this certificate)
    per_precision = {}
    top1_ref = np.argmax(ref_out["clipwise_output"], axis=1)
    top6_ref = np.argsort(-ref_out["clipwise_output"], axis=1)[:, :6]
    for fe_prec in ("high", "default"):
        serve_cfg = ConvNeXtConfig(
            drop_path_rate=0.0,
            block_impl="xla_approx",
            frontend=FrontendConfig(precision=fe_prec),
        )
        ev = Evaluator(params, serve_cfg, mesh=get_mesh(), compute_dtype=jnp.bfloat16)
        t0 = time.perf_counter()
        ours = ev.infer_probs(loader)
        tpu_s = time.perf_counter() - t0
        stats = M.evaluate_clipwise(ours["clipwise_output"], ours["target"])
        map_ours = float(np.nanmean(stats["average_precision"]))
        auc_ours = float(np.nanmean(stats["auc"]))
        top1_ours = np.argmax(ours["clipwise_output"], axis=1)
        top6_ours = np.argsort(-ours["clipwise_output"], axis=1)[:, :6]
        per_precision[fe_prec] = {
            "map_serving_bf16_tpu": round(map_ours, 6),
            "auc_serving_bf16_tpu": round(auc_ours, 6),
            "map_delta": round(abs(map_ours - map_ref), 6),
            "max_prob_delta": round(float(np.max(np.abs(
                ours["clipwise_output"] - ref_out["clipwise_output"]))), 6),
            "top1_agreement": round(float(np.mean(top1_ref == top1_ours)), 4),
            "top6_rank_agreement": round(float(np.mean(
                [len(set(a) & set(b)) / 6.0
                 for a, b in zip(top6_ref, top6_ours)])), 4),
            "tpu_seconds": round(tpu_s, 1),
        }
        print(f"precision={fe_prec}: {json.dumps(per_precision[fe_prec])}",
              flush=True)

    shipped = per_precision["default"]  # the bf16 serving default
    delta_map = shipped["map_delta"]
    map_ours, auc_ours = shipped["map_serving_bf16_tpu"], shipped["auc_serving_bf16_tpu"]
    max_prob_delta, top1_agree = shipped["max_prob_delta"], shipped["top1_agreement"]
    top6_agree, tpu_s = shipped["top6_rank_agreement"], shipped["tpu_seconds"]

    result = {
        "metric": "serving_config_map_delta_vs_reference_f32_trained_weights",
        "value": round(delta_map, 6),
        "unit": "mAP delta",
        "pass": bool(all(p["map_delta"] < 1e-3 and p["top1_agreement"] >= 0.999
                         for p in per_precision.values())),
        "detail": {
            "backend": backend,
            "geometry": "convnext_tiny dims 96-768, 28.2M params, 10 s clips, "
                        "fused stages (63,14)/(31,7)",
            "weights": "TRAINED on TPU (400-step production-recipe overfit, "
                       "16 tone classes) then exported to the reference model "
                       "via jax_params_to_torch_state_dict",
            "serving_config": "bf16 + xla_approx (tanh GELU) + fused stage-3/4 "
                              "Mosaic kernels + frontend 'default' (round-4 "
                              "serving default; 'high' certified alongside)",
            "frontend_precision_ab": per_precision,
            "eval_set": "256 HELD-OUT clips (16/class, unseen phases/amps/noise)",
            "n_clips": n_clips,
            "batch": batch,
            "final_train_loss": round(final_loss, 4),
            "map_reference_f32": round(map_ref, 6),
            "map_serving_bf16_tpu": round(map_ours, 6),
            "auc_reference_f32": round(auc_ref, 6),
            "auc_serving_bf16_tpu": round(auc_ours, 6),
            "max_prob_delta": round(max_prob_delta, 6),
            "top1_agreement": round(top1_agree, 4),
            "top6_rank_agreement": round(top6_agree, 4),
            "reference_host_seconds": round(ref_s, 1),
            "tpu_seconds": round(tpu_s, 1),
        },
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SERVING_PARITY_r04.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
