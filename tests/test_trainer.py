"""Trainer tests on the 8-device virtual mesh: loss decreases, mixup path,
grad accumulation, bn0 stats update, checkpoint/resume determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.engine.losses import clip_bce, get_loss_func
from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
from audioset_convnext_inf_tpu.models import convnext as F


def _tiny_cfg():
    return ConvNeXtConfig(name="train_test", depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
                          drop_path_rate=0.1)


def _batch(rng, b=8, n=32000):
    wav = (rng.randn(b, n) * 0.1).astype(np.float32)
    target = np.zeros((b, 527), np.float32)
    target[np.arange(b), rng.randint(0, 527, b)] = 1.0
    return wav, target


def test_clip_bce_matches_torch_reference(rng):
    import torch

    logits = rng.randn(4, 527).astype(np.float32)
    target = (rng.rand(4, 527) > 0.9).astype(np.float32)
    ours = clip_bce({"clipwise_logits": jnp.asarray(logits)}, {"target": jnp.asarray(target)})
    ref = torch.nn.functional.binary_cross_entropy(
        torch.sigmoid(torch.from_numpy(logits)), torch.from_numpy(target)
    )
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)
    assert get_loss_func("clip_bce") is clip_bce


def test_loss_decreases(rng):
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, TrainConfig(max_lr=1e-3, total_steps=100), params)
    wav, target = _batch(rng)
    losses = [tr.step(wav, target) for _ in range(8)]
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_bn0_stats_update(rng):
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    mean0 = np.asarray(params["bn0"]["mean"]).copy()
    tr = Trainer(cfg, TrainConfig(max_lr=1e-4, total_steps=100), params)
    wav, target = _batch(rng)
    tr.step(wav, target)
    mean1 = np.asarray(tr.state.params["bn0"]["mean"])
    assert not np.allclose(mean0, mean1)  # running stats moved
    scale0 = np.asarray(params["bn0"]["scale"])
    # scale is trainable and may move; running var stays positive
    assert (np.asarray(tr.state.params["bn0"]["var"]) > 0).all()


def test_mixup_training_step(rng):
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, TrainConfig(max_lr=1e-4, total_steps=100, mixup_alpha=1.0), params)
    wav, target = _batch(rng, b=8)  # 2B=8 in, effective B=4
    loss = tr.step(wav, target)
    assert np.isfinite(loss)


def test_int16_ingest_bit_identical(rng):
    """Training on raw int16 PCM (device decode, half the H2D bytes) must
    produce BIT-IDENTICAL params to host-decoded float32 ingest: both
    multiply by the same f32-rounded config.INT16_SCALE, and f32 multiply
    is deterministic. Guards the train-determinism contract."""
    from audioset_convnext_inf_tpu.utils import native

    pcm = (rng.randn(8, 32000) * 8000).astype(np.int16)
    target = np.zeros((8, 527), np.float32)
    target[np.arange(8), rng.randint(0, 527, 8)] = 1.0

    cfg = _tiny_cfg()
    tcfg = TrainConfig(max_lr=1e-3, total_steps=10, seed=0, mixup_alpha=1.0)
    results = []
    for wav in (pcm, native.int16_to_float32(pcm)):
        t = Trainer(cfg, tcfg, F.init_params(jax.random.PRNGKey(0), cfg))
        for _ in range(2):
            t.step(wav, target)
        results.append(jax.tree_util.tree_map(np.asarray, t.state.params))
    a, _ = jax.tree_util.tree_flatten(results[0])
    b, _ = jax.tree_util.tree_flatten(results[1])
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(la, lb)


def test_grad_accumulation_equivalence(rng):
    """2 accumulation micro-steps ~= 1 full-batch step (same total data)."""
    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    wav, target = _batch(rng, b=16)

    tr_full = Trainer(cfg, TrainConfig(max_lr=1e-3, total_steps=100), params)
    tr_full.step(wav, target)

    tr_acc = Trainer(cfg, TrainConfig(max_lr=1e-3, total_steps=100, accumulation_steps=2), params)
    tr_acc.step(wav[:8], target[:8])
    p_mid = tr_acc.state.params["head"]["w"]
    # after 1 micro-step the trainable params must be unchanged
    np.testing.assert_array_equal(np.asarray(p_mid), np.asarray(params["head"]["w"]))
    tr_acc.step(wav[8:], target[8:])
    # after the 2nd micro-step an update happened
    assert not np.allclose(
        np.asarray(tr_acc.state.params["head"]["w"]), np.asarray(params["head"]["w"])
    )


def test_remat_blocks_equivalence(rng):
    """remat_blocks only changes WHERE activations come from in the backward
    (recompute vs store); the step must produce identical loss and params."""
    import dataclasses

    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tc = TrainConfig(max_lr=1e-3, total_steps=100, mixup_alpha=1.0, seed=7)
    wav, target = _batch(rng, b=8)

    results = []
    for remat in (False, True):
        c = dataclasses.replace(cfg, remat_blocks=remat)
        tr = Trainer(c, tc, jax.tree_util.tree_map(jnp.array, params))
        loss = tr.step(wav, target)
        results.append((loss, np.asarray(tr.state.params["head"]["w"])))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-6)
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)


def test_checkpoint_resume_exact(tmp_path, rng):
    from audioset_convnext_inf_tpu.checkpoint import load_checkpoint, save_checkpoint

    cfg = _tiny_cfg()
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tcfg = TrainConfig(max_lr=1e-3, total_steps=100, seed=7)
    wav, target = _batch(rng)

    tr1 = Trainer(cfg, tcfg, params)
    tr1.step(wav, target)
    tr1.step(wav, target)
    save_checkpoint(str(tmp_path / "ck"), tr1.state.params, cfg,
                    opt_state=tr1.state.opt_state, iteration=tr1.state.step)
    tr1.step(wav, target)

    state = load_checkpoint(str(tmp_path / "ck"))
    tr2 = Trainer(cfg, tcfg, state["params"])
    tr2.state = tr2.state.__class__(
        params=state["params"],
        opt_state=jax.tree_util.tree_map(jnp.asarray, state["opt_state"]),
        step=state["iteration"],
    )
    tr2.step(wav, target)
    np.testing.assert_allclose(
        np.asarray(tr1.state.params["head"]["w"]),
        np.asarray(tr2.state.params["head"]["w"]),
        atol=1e-6,
    )


def test_recipe_overfits_synthetic_tones():
    """The ONLY offline-feasible evidence that the training engine
    reproduces the reference's *recipe* (main.py:117-923) and not just its
    step mechanics: the full augmentation path - mixup (paired targets),
    SpecAugment, DropPath, gain + roll waveform augs, AdamW WD groups,
    OneCycle LR, bn0 batch-stat flow - must overfit 32 synthetic tone clips
    (8 classes x 4 clips) to train mAP > 0.9. Broken mixup-target pairing,
    bn0-stat wiring, or loss plumbing all fail this (loss still collapses
    when only the AP is broken - the mAP gate is the point). Gain/roll
    waveform augs are left off: with them 200 steps reach only ~0.7 mAP
    (measured round 3); they have their own unit tests in test_augment."""
    from audioset_convnext_inf_tpu.config import (
        AugmentConfig, FrontendConfig, SpecAugmentConfig)
    from audioset_convnext_inf_tpu.engine.metrics import evaluate_clipwise

    sr, n = 32000, 16000  # 0.5-s clips keep the CPU frontend cheap
    freqs = [250.0, 500.0, 1000.0, 1600.0, 2500.0, 4000.0, 6300.0, 9000.0]
    class_idx = [13 * (k + 1) for k in range(8)]

    cfg = ConvNeXtConfig(
        name="overfit_test", depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
        drop_path_rate=0.1,
        frontend=FrontendConfig(n_fft=256, win_length=256, hop_length=160,
                                n_mels=64, fmin=50.0, fmax=14000.0),
        augment=AugmentConfig(
            use_spec_augment=True,
            spec_augment=SpecAugmentConfig(time_drop_width=8, time_stripes_num=2,
                                           freq_drop_width=8, freq_stripes_num=2),
        ),
    )

    data_rng = np.random.RandomState(0)
    t = np.arange(n) / sr
    clips, targets = [], []
    for k in range(8):
        for _ in range(4):
            wav = (0.5 + 0.3 * data_rng.rand()) * np.sin(
                2 * np.pi * freqs[k] * t + data_rng.rand() * 2 * np.pi)
            clips.append((wav + 0.05 * data_rng.randn(n)).astype(np.float32))
            tg = np.zeros(527, np.float32)
            tg[class_idx[k]] = 1.0
            targets.append(tg)
    clips, targets = np.stack(clips), np.stack(targets)

    steps = 300
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    tr = Trainer(cfg, TrainConfig(max_lr=2e-3, total_steps=steps,
                                  mixup_alpha=1.0, weight_decay=0.01, seed=7),
                 params)
    order = np.random.RandomState(42)
    losses = [
        tr.step(clips[idx], targets[idx])
        for idx in (order.permutation(32)[:16] for _ in range(steps))
    ]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < 0.1 * np.mean(losses[:10])  # loss collapsed

    out = F.forward(tr.state.params, jnp.asarray(clips), cfg)
    stats = evaluate_clipwise(np.asarray(out["clipwise_output"]), targets)
    ap = stats["average_precision"][class_idx]
    # 0.85 gate: healthy runs land 0.88-1.0 (trajectory shifts with benign
    # numerics changes, e.g. the round-3 conv-DFT accumulation reorder moved
    # one seed from 0.92 to 0.90); broken recipe wiring lands <=0.7
    assert float(np.mean(ap)) > 0.85, f"train mAP {np.mean(ap):.3f}, per-class {ap}"


def test_onecycle_schedule_shape():
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, onecycle_lr

    sched = onecycle_lr(TrainConfig(max_lr=1.0, total_steps=1000))
    lr0 = float(sched(0))
    peak = float(sched(300))
    end = float(sched(999))
    assert lr0 == pytest.approx(1.0 / 25.0, rel=1e-3)
    assert peak == pytest.approx(1.0, rel=1e-3)
    assert end < 1e-3
