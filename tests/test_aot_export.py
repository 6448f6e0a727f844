"""AOT serving-export tests (engine/aot_export.py).

The exported StableHLO artifact must reproduce the live model to ~1 ULP
(separate XLA compilations may fuse differently), survive a serialize/
deserialize round trip bit-identically with no model code, and the bundle
loader must implement the pad-to-bucket serving contract.
"""

import json
import os

import numpy as np
import pytest

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.engine.aot_export import (
    export_serving,
    load_bundle,
    save_bundle,
)
from audioset_convnext_inf_tpu.models.api import ConvNeXt
from audioset_convnext_inf_tpu.models import convnext as F

import jax

N = 16000  # short clips keep CPU compiles fast


@pytest.fixture(scope="module")
def model():
    cfg = ConvNeXtConfig(name="aot_test", depths=(1, 1, 1, 1),
                         dims=(16, 32, 64, 128), drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    return ConvNeXt(cfg, params)


@pytest.fixture(scope="module")
def wav():
    rng = np.random.RandomState(0)
    return (rng.randn(3, N) * 0.1).astype(np.float32)


def test_export_matches_live_model(model, wav):
    exp = export_serving(model, 3, num_samples=N)
    out = exp.call(wav)
    ref = model.forward(wav)
    # separate XLA compilations (exported module vs live jit) may differ
    # by ~1 ULP in fusion order; tight allclose, not bit-equality
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["clipwise_logits"]),
                               np.asarray(ref["clipwise_logits"]), atol=1e-5)


def test_serialize_roundtrip_no_model_code(model, wav, tmp_path):
    exp = export_serving(model, 3, num_samples=N)
    blob = exp.serialize()
    from jax import export as jex

    again = jex.deserialize(bytearray(blob))
    out = again.call(wav)
    # round trip must be bit-identical to the pre-serialization export
    np.testing.assert_array_equal(np.asarray(out["clipwise_output"]),
                                  np.asarray(exp.call(wav)["clipwise_output"]))
    ref = model.forward(wav)
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]), atol=1e-6)


def test_bundle_pad_to_bucket_and_slice(model, wav, tmp_path):
    path = str(tmp_path / "bundle")
    manifest = save_bundle(model, path, batch_sizes=(2, 4), num_samples=N)
    assert manifest["param_count"] == model.count_parameters()
    bundle = load_bundle(path)

    # B=3 pads to bucket 4 and slices back; must equal the live forward
    out = bundle(wav)
    ref = model.forward(wav)
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]),
                               rtol=0, atol=1e-6)
    assert np.asarray(out["clipwise_output"]).shape == (3, 527)

    # exact-bucket batch takes the unpadded program
    out2 = bundle(wav[:2])
    np.testing.assert_allclose(np.asarray(out2["clipwise_logits"]),
                               np.asarray(ref["clipwise_logits"])[:2], atol=1e-5)

    assert bundle.bucket_for(1) == 2 and bundle.bucket_for(4) == 4
    with pytest.raises(ValueError):
        bundle.bucket_for(5)
    with pytest.raises(ValueError):
        bundle(wav[:, : N // 2])


def test_bundle_scene_kind_and_manifest(model, wav, tmp_path):
    path = str(tmp_path / "bundle_scene")
    save_bundle(model, path, batch_sizes=(4,), kinds=("forward", "scene"),
                num_samples=N)
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    assert set(manifest["entries"]) == {"forward:4", "scene:4"}
    bundle = load_bundle(path)
    emb = bundle(wav, kind="scene")
    ref = model.forward_scene_embeddings(wav)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(ref), atol=1e-5)


def test_shared_weights_bundle(model, wav, tmp_path):
    """weights='shared' stores params ONCE (params.npz) and exports small
    parameterized programs; outputs match the baked bundle exactly and the
    per-program artifacts shrink by ~the param bytes."""
    baked = str(tmp_path / "baked")
    shared = str(tmp_path / "shared")
    save_bundle(model, baked, batch_sizes=(2, 4), num_samples=N)
    save_bundle(model, shared, batch_sizes=(2, 4), num_samples=N,
                weights="shared")

    baked_prog = os.path.getsize(os.path.join(baked, "forward_b4.jaxexport"))
    shared_prog = os.path.getsize(os.path.join(shared, "forward_b4.jaxexport"))
    assert os.path.exists(os.path.join(shared, "params.npz"))
    # weights no longer duplicated: each program shrinks by ~the param
    # bytes. (Both still embed the frontend DFT/mel matrices as constants,
    # which dominate at this tiny test width - so compare against the param
    # footprint, not a fixed fraction.)
    param_bytes = sum(v.nbytes for v in
                      jax.tree_util.tree_leaves(model.params))
    assert shared_prog <= baked_prog - 0.8 * param_bytes

    out_s = load_bundle(shared)(wav)
    out_b = load_bundle(baked)(wav)
    np.testing.assert_allclose(np.asarray(out_s["clipwise_output"]),
                               np.asarray(out_b["clipwise_output"]),
                               atol=1e-6)
    ref = model.forward(wav)
    np.testing.assert_allclose(np.asarray(out_s["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]), atol=1e-6)


def test_dynamic_batch_bundle(model, wav, tmp_path):
    """A 'dynamic' bucket exports ONE symbolic-batch program that serves
    any batch size; fixed buckets are preferred when they fit (they are
    precompiled - dynamic specializes per call shape)."""
    path = str(tmp_path / "bundle_dyn")
    manifest = save_bundle(model, path, batch_sizes=(2, "dynamic"),
                           num_samples=N)
    assert manifest["dynamic"] is True and manifest["batch_sizes"] == [2]
    bundle = load_bundle(path)
    assert bundle.bucket_for(1) == 2          # fixed bucket preferred
    assert bundle.bucket_for(7) == "dynamic"  # beyond max fixed -> symbolic

    ref = model.forward(wav)
    out = bundle(wav)  # B=3 > 2 -> dynamic program, unpadded
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]), atol=1e-6)

    from audioset_convnext_inf_tpu.engine.aot_export import BundleModel

    assert BundleModel(bundle).max_batch is None


def test_export_cli(model, wav, tmp_path, monkeypatch):
    from audioset_convnext_inf_tpu.cli import export_serving as cli

    import audioset_convnext_inf_tpu.models.api as api
    monkeypatch.setattr(api, "create_model", lambda name, **kw: model)
    out = str(tmp_path / "cli_bundle")
    rc = cli.main([out, "--batch-sizes", "4", "--num-samples", str(N)])
    assert rc == 0
    bundle = load_bundle(out)
    res = bundle(wav)
    assert np.asarray(res["clipwise_output"]).shape == (3, 527)


def test_bundle_model_serves_through_inference_service(model, wav, tmp_path):
    """BundleModel adapts an AOT bundle to the serving stack: the dynamic
    batcher runs against deserialized programs with no live model."""
    from audioset_convnext_inf_tpu.engine.aot_export import BundleModel
    from audioset_convnext_inf_tpu.engine.service import InferenceService

    path = str(tmp_path / "bundle_svc")
    save_bundle(model, path, batch_sizes=(4,), kinds=("forward", "scene"),
                pcm=True, num_samples=N)
    bm = BundleModel(load_bundle(path))
    assert bm.max_batch == 4

    # float32 requests quantize to the bundle's int16 wire format; feed the
    # live model the SAME quantized PCM so the comparison isolates the
    # adapter+bundle from 16-bit quantization noise - remaining deltas are
    # separate-compilation fusion drift (~1 ULP)
    pcm = bm._adapt(wav)
    assert pcm.dtype == np.int16
    ref = model.forward(pcm)
    with InferenceService(bm, batch_size=4, max_wait_ms=5.0,
                          clip_samples=N, pcm_int16=True) as svc:
        futs = [svc.submit(wav[i]) for i in range(3)]
        outs = np.stack([f.result(timeout=60)["clipwise_output"] for f in futs])
    np.testing.assert_allclose(outs, np.asarray(ref["clipwise_output"]),
                               atol=1e-5)

    emb = np.asarray(bm.forward_scene_embeddings(wav))
    np.testing.assert_allclose(
        emb, np.asarray(model.forward_scene_embeddings(pcm)), atol=1e-5)

    # missing kind -> clear error
    with pytest.raises(ValueError, match="no 'frame'"):
        bm.bundle(bm._adapt(wav), kind="frame")


def test_bundle_int16_pcm_entry(model, tmp_path):
    path = str(tmp_path / "bundle_pcm")
    save_bundle(model, path, batch_sizes=(2,), pcm=True, num_samples=N)
    bundle = load_bundle(path)
    rng = np.random.RandomState(1)
    pcm = (rng.randn(2, N) * 3000).astype(np.int16)
    out = bundle(pcm)
    ref = model.forward(pcm)  # model API decodes int16 on-device already
    np.testing.assert_allclose(np.asarray(out["clipwise_output"]),
                               np.asarray(ref["clipwise_output"]), atol=1e-6)
    with pytest.raises(ValueError):
        bundle(pcm.astype(np.float32))


def test_dynamic_export_with_fused_serving_config(monkeypatch):
    """A dynamic (symbolic-batch) export of the xla_approx serving config
    must trace: the fused-kernel %16 gate cannot be decided for a symbolic
    dim, so it resolves False and the program takes the pure-XLA trunk
    (engine/aot_export.py docs). Before round 5 this raised
    InconclusiveDimensionOperation."""
    monkeypatch.setattr(F, "_FUSED_ON_CPU", True)
    cfg = ConvNeXtConfig(name="aot_dyn_fused", depths=(1, 1, 1, 1),
                         dims=(16, 32, 64, 128), drop_path_rate=0.0,
                         block_impl="xla_approx")
    m = ConvNeXt(cfg, F.init_params(jax.random.PRNGKey(0), cfg))
    exp = export_serving(m, "dynamic", num_samples=N)
    rng = np.random.RandomState(1)
    for b in (2, 5):
        w = (rng.randn(b, N) * 0.1).astype(np.float32)
        out = np.asarray(exp.call(w)["clipwise_output"])
        ref = np.asarray(m.forward(w)["clipwise_output"])
        np.testing.assert_allclose(out, ref, atol=1e-6)
