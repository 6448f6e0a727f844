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
