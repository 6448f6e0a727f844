"""Mesh/sharding helper and prefetcher tests on the 8-device virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    pad_batch_to_multiple,
    replicate,
    shard_batch,
)


def test_mesh_spans_all_devices():
    mesh = get_mesh()
    assert mesh.size == 8
    assert mesh.axis_names == ("data",)


def test_shard_batch_places_leading_dim():
    mesh = get_mesh()
    batch = {"waveform": np.random.randn(16, 100).astype(np.float32),
             "name": np.array(["a"] * 16)}
    out = shard_batch({"waveform": batch["waveform"]}, mesh)
    arr = out["waveform"]
    assert arr.sharding.spec == batch_sharding(mesh).spec
    # each device holds 2 rows
    assert arr.addressable_shards[0].data.shape == (2, 100)


def test_replicated_params_compute_with_sharded_batch():
    mesh = get_mesh()
    w = jax.device_put(jnp.ones((100, 4)), replicate(mesh))
    x = jax.device_put(jnp.ones((16, 100)), batch_sharding(mesh))
    y = jax.jit(lambda w, x: x @ w)(w, x)
    assert y.shape == (16, 4)
    np.testing.assert_allclose(np.asarray(y), 100.0)
    # output inherits the data sharding from the batch input
    assert y.addressable_shards[0].data.shape[0] == 2


def test_pad_batch_to_multiple():
    batch = {"waveform": np.ones((13, 5), np.float32), "valid": 13}
    out, n = pad_batch_to_multiple(batch, 8)
    assert n == 13
    assert out["waveform"].shape == (16, 5)
    assert (out["waveform"][13:] == 0).all()


def test_device_prefetch_keeps_order(tmp_path):
    from audioset_convnext_inf_tpu.data import device_prefetch

    batches = [{"waveform": np.full((4, 10), i, np.float32), "valid": 4} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        np.testing.assert_allclose(np.asarray(b["waveform"]), i)


def test_statistics_container_roundtrip(tmp_path):
    from audioset_convnext_inf_tpu.engine import StatisticsContainer

    path = str(tmp_path / "stats.pkl")
    sc = StatisticsContainer(path)
    sc.append(5000, {"mAP": 0.1}, "bal")
    sc.append(10000, {"mAP": 0.2}, "test")
    sc.append(15000, {"mAP": 0.3}, "test")
    sc.dump()

    sc2 = StatisticsContainer(path)
    sc2.load_state_dict(resume_iteration=10000)
    assert [s["iteration"] for s in sc2.statistics_dict["test"]] == [10000]
    assert [s["iteration"] for s in sc2.statistics_dict["bal"]] == [5000]


def _small_cfg():
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig

    return ConvNeXtConfig(
        name="dp_small", depths=(1, 1, 1, 1), dims=(32, 64, 128, 256),
        drop_path_rate=0.1,
    )


def test_sharded_train_step_matches_single_device():
    """The actual DP-correctness property: one train step on the 8-device
    mesh (batch sharded, params replicated, XLA-inserted grad all-reduce)
    produces the same loss and updated params as the same step on 1 device."""
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = _small_cfg()
    tc = TrainConfig(max_lr=1e-3, total_steps=100, mixup_alpha=1.0, seed=7)
    params = F.init_params(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(3)
    wav = (rng.randn(16, 16000) * 0.1).astype(np.float32)  # mixup pairs -> 8
    tgt = (rng.rand(16, cfg.num_classes) < 0.05).astype(np.float32)

    losses, flats = [], []
    for devs in (jax.devices()[:1], jax.devices()[:8]):
        mesh = get_mesh(devs)
        tr = Trainer(cfg, tc, jax.tree_util.tree_map(jnp.array, params), mesh=mesh)
        losses.append(tr.step(wav, tgt))
        flats.append(jax.tree_util.tree_leaves(tr.state.params))

    # identical PRNG keys => identical SpecAugment/DropPath/mixup draws; the
    # only fp difference is the reduction order of the sharded grad psum
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    # Adam's update normalizes by sqrt(v): psum reduction-order noise in the
    # grads (~1e-8) can surface as ~3e-6 in the updated params
    for a, b in zip(flats[0], flats[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sharded_eval_forward_matches_unsharded():
    from audioset_convnext_inf_tpu.engine.evaluator import Evaluator
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = _small_cfg()
    params = F.init_params(jax.random.PRNGKey(1), cfg)
    rng = np.random.RandomState(5)
    loader = [{"waveform": (rng.randn(12, 16000) * 0.1).astype(np.float32)}]

    probs = []
    for devs in (jax.devices()[:1], jax.devices()[:8]):
        ev = Evaluator(params, cfg, mesh=get_mesh(devs))
        probs.append(ev.infer_probs(loader)["clipwise_output"])
    np.testing.assert_allclose(probs[0], probs[1], atol=1e-6)


def test_sharded_eval_with_fused_stages_matches_unsharded(rng, monkeypatch):
    """The fused HWBC block kernels (a Pallas custom-call GSPMD cannot split
    itself) must still produce the unsharded result when the eval batch is
    sharded over the full mesh - the production serving layout on a pod."""
    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.parallel.mesh import (
        batch_sharding,
        get_mesh,
        replicate,
    )

    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)
    mesh = get_mesh(jax.devices()[:8])
    cfg = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(32, 64, 128, 256),
                         drop_path_rate=0.0, block_impl="xla_approx")
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    params_r = jax.device_put(params, replicate(mesh))
    x = jnp.asarray(rng.randn(128, 120, 56, 1) * 0.5, jnp.float32)
    xs = jax.device_put(x, batch_sharding(mesh))

    y = jax.jit(lambda p, x: F.forward_features(x, p, cfg))(params_r, xs)
    y1 = F.forward_features(x, params, cfg)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y1), atol=1e-5)


def test_fused_train_shard_map_step_matches_single_device(monkeypatch):
    """cfg.fused_train_blocks on a multi-device mesh: the trainer routes the
    trunk through shard_map (GSPMD cannot partition the Mosaic custom calls
    of the fused forward/backward kernels), with the prologue - augs,
    frontend, bn0 batch statistics, SpecAugment - still global. One step
    must produce the same loss and updated params as the same step on one
    device (where the standard jit path runs the same fused kernels).

    Geometry: T=240 frames -> stage heights 62/31/15/7; bwd tiles (5,1)/(4,2)
    satisfy the backward DMA classes on both fused stages, so stages 3-4
    really run the custom-VJP kernels inside shard_map (per-device batch 16
    passes the %16 gate). drop_path=0: the per-shard drop-path streams are
    the one intentionally rank-local draw (reference per-rank DDP seeds).
    A 2-device mesh keeps the interpret-mode kernel cost down - the sharding
    mechanics (shard_map closure, pmean, psum gradient transpose) are
    device-count-independent and the 8-way layout is covered by
    test_sharded_train_step_matches_single_device.
    """
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.engine.trainer import TrainConfig, Trainer
    from audioset_convnext_inf_tpu.models import convnext as F

    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)
    monkeypatch.setattr(F, "_BWD_STAGE_TILES", {2: (5, 1), 3: (4, 2)})

    cfg = ConvNeXtConfig(
        name="dp_fused_train", depths=(1, 1, 1, 1), dims=(32, 64, 128, 256),
        drop_path_rate=0.0, block_impl="xla_approx", fused_train_blocks=True,
    )
    tc = TrainConfig(max_lr=1e-3, total_steps=100, mixup_alpha=0.0, seed=11)
    params = F.init_params(jax.random.PRNGKey(2), cfg)

    rng = np.random.RandomState(9)
    wav = (rng.randn(32, 239 * 320) * 0.1).astype(np.float32)  # 240 frames
    tgt = (rng.rand(32, cfg.num_classes) < 0.05).astype(np.float32)

    losses, flats = [], []
    for devs in (jax.devices()[:1], jax.devices()[:2]):
        mesh = get_mesh(devs)
        tr = Trainer(cfg, tc, jax.tree_util.tree_map(jnp.array, params), mesh=mesh)
        losses.append(tr.step(wav, tgt))
        flats.append(jax.tree_util.tree_leaves(tr.state.params))

    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    for a, b in zip(flats[0], flats[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_two_process_distributed_bootstrap(tmp_path):
    """REAL multi-process rendezvous through parallel/dist.py's SLURM env
    path: two OS processes (2 virtual CPU devices each) initialize one
    jax.distributed runtime, see a 4-device global mesh, and agree on a
    cross-process reduction. The in-process tests above cover sharding
    math; this covers the bootstrap itself (coordinator resolution,
    process ids, is_primary)."""
    import os
    import subprocess
    import sys

    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    jobid = str(os.getpid() % 10000)  # dist.py derives the port from JOBID
    env = {k: v for k, v in os.environ.items() if not k.startswith("SLURM")}
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), jobid],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK global_devices=4" in out, out
