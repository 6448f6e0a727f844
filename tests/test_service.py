"""Dynamic-batching inference service tests."""

import threading

import numpy as np
import pytest

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.engine.service import InferenceService


class _CountingModel:
    """Fake model recording forward batch sizes."""

    def __init__(self):
        self.batches = []

    def forward(self, wav):
        self.batches.append(wav.shape[0])
        b = wav.shape[0]
        probs = np.tile(np.abs(wav).mean(axis=1, keepdims=True), (1, 527))
        return {"clipwise_output": probs, "clipwise_logits": probs}


def test_service_single_request():
    model = _CountingModel()
    with InferenceService(model, batch_size=4, max_wait_ms=5, clip_samples=1000) as svc:
        out = svc.tag(np.ones(500, np.float32))
    assert out["clipwise_output"].shape == (527,)
    # half the clip is padding -> mean |x| = 0.5
    np.testing.assert_allclose(out["clipwise_output"][0], 0.5, atol=1e-6)


def test_service_batches_concurrent_requests():
    model = _CountingModel()
    with InferenceService(model, batch_size=8, max_wait_ms=100, clip_samples=100) as svc:
        futs = [svc.submit(np.full(100, i / 10, np.float32)) for i in range(8)]
        results = [f.result(timeout=10) for f in futs]
    for i, r in enumerate(results):
        np.testing.assert_allclose(r["clipwise_output"][0], i / 10, atol=1e-6)
    # the 8 concurrent requests coalesced into few device batches
    assert svc.stats["requests"] == 8
    assert svc.stats["batches"] <= 3


def test_service_error_propagates_and_keeps_serving():
    class FlakyModel:
        def __init__(self):
            self.calls = 0

        def forward(self, wav):
            self.calls += 1
            if self.calls == 2:  # first call is warmup
                raise RuntimeError("boom")
            p = np.zeros((wav.shape[0], 527), np.float32)
            return {"clipwise_output": p, "clipwise_logits": p}

    with InferenceService(FlakyModel(), batch_size=2, max_wait_ms=5, clip_samples=10) as svc:
        with pytest.raises(RuntimeError):
            svc.tag(np.ones(10, np.float32), timeout=10)
        out = svc.tag(np.ones(10, np.float32), timeout=10)  # recovered
        assert out["clipwise_output"].shape == (527,)


def test_service_under_concurrent_load():
    """200 concurrent submissions from 8 threads: all resolve, batching
    keeps device calls well below request count."""
    from concurrent.futures import ThreadPoolExecutor

    model = _CountingModel()
    with InferenceService(model, batch_size=16, max_wait_ms=20, clip_samples=64) as svc:
        def one(i):
            return svc.tag(np.full(64, (i % 50) / 100, np.float32), timeout=30)

        with ThreadPoolExecutor(8) as pool:
            results = list(pool.map(one, range(200)))
    assert len(results) == 200
    for i, r in enumerate(results):
        np.testing.assert_allclose(r["clipwise_output"][0], (i % 50) / 100, atol=1e-6)
    assert svc.stats["requests"] == 200
    # coalescing check without scheduling sensitivity: mean batch > 1 OR the
    # machine was so contended that batching genuinely couldn't happen
    assert svc.stats["batches"] < svc.stats["requests"]


def test_http_server_end_to_end(tmp_path):
    """Spin the real HTTP CLI on a free port against a tiny model and hit
    /healthz + /tag + /embed with urllib."""
    import json
    import socket
    import time
    import urllib.request

    import jax

    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.models.api import ConvNeXt

    # tiny trunk to keep compiles fast
    cfg = ConvNeXtConfig(name="svc_test", depths=(1, 1, 1, 1), dims=(8, 16, 32, 64),
                         drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    model = ConvNeXt(cfg, params)

    import audioset_convnext_inf_tpu.cli.serve as serve_mod

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    # run main() in a thread with a monkeypatched model factory
    orig = serve_mod.main

    def run():
        import audioset_convnext_inf_tpu.models as models_mod

        real = models_mod.convnext_tiny
        models_mod.convnext_tiny = lambda **kw: model
        try:
            orig(["--port", str(port), "--batch-size", "2", "--max-wait-ms", "5"])
        finally:
            models_mod.convnext_tiny = real

    t = threading.Thread(target=run, daemon=True)
    t.start()

    deadline = time.time() + 120
    health = None
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                health = json.load(r)
            break
        except Exception:
            time.sleep(0.5)
    assert health and health["status"] == "ok"

    pcm = (np.random.RandomState(0).randn(32000) * 0.1).astype(np.float32).tobytes()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/tag", data=pcm,
        headers={"Content-Type": "application/octet-stream"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        out = json.load(r)
    assert len(out["labels"]) == 10 and len(out["probs"]) == 10
    assert all(0.0 <= p <= 1.0 for p in out["probs"])
