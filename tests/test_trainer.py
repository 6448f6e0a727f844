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


def test_onecycle_schedule_shape():
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, onecycle_lr

    sched = onecycle_lr(TrainConfig(max_lr=1.0, total_steps=1000))
    lr0 = float(sched(0))
    peak = float(sched(300))
    end = float(sched(999))
    assert lr0 == pytest.approx(1.0 / 25.0, rel=1e-3)
    assert peak == pytest.approx(1.0, rel=1e-3)
    assert end < 1e-3
