"""Service-level characterization on the real chip (round 5).

Drives ``engine/service.py`` — the dynamic-batching analog of the
reference's inference entry (pytorch/inference.py:19-240) — under
concurrent client load, and runs ``scripts/bench_latency.py``-style
small-batch latency, writing one combined ``LATENCY_r05.json``.

Phase 0 isolates the BATCHER's own cost from device compute and relay
transport (round-4 VERDICT weak #6): the same client load drives the
identical threading machinery against an instant host-side fake model, so
clips/s there is the pure queueing/coalescing/future-fan-out ceiling. The
non-relay service projection is then
1 / (batcher_overhead_per_clip + compute_per_clip[bench.py]).

Load phase: K client threads each keep a bounded window of int16-PCM
clips in flight (closed loop), the service coalesces them into B-row
batches, double-buffered on the device. Reports sustained clips/s and
request-latency percentiles.

Relay caveat (NOTES.md traps): through the dev tunnel every batch's
result fetch (B x 527 probs+logits, f32) rides a ~MB/s D2H link, so the
sustained number here characterizes the service THROUGH THE RELAY - a
lower bound with ~0.5 s/batch of pure link time baked in. bench.py's
device-resident chain (1612 clips/s/chip) is the compute-side capacity;
on non-tunneled hardware D2H of 4 KB/clip is noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--inflight", type=int, default=32, help="per-client window")
    ap.add_argument("--clips", type=int, default=1024, help="total clips, load phase")
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--max-wait-ms", type=float, default=20.0)
    ap.add_argument("--latency-batches", type=int, nargs="+", default=[1, 16, 32])
    ap.add_argument("--latency-iters", type=int, default=48)
    args = ap.parse_args()

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES
    from audioset_convnext_inf_tpu.engine.service import InferenceService
    from audioset_convnext_inf_tpu.models import convnext_tiny

    model = convnext_tiny(drop_path_rate=0.0, seed=0, compute_dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    clip = (rng.randn(CLIP_SAMPLES) * 6000).astype(np.int16)
    per_client = args.clips // args.clients

    def drive(svc):
        """K closed-loop clients against ``svc``; returns (latencies, wall)."""
        latencies: list = []
        lat_lock = threading.Lock()
        # prime: one full batch through the service before timing
        [f.result(timeout=600)
         for f in [svc.submit(clip) for _ in range(args.batch_size)]]

        def client():
            from collections import deque

            window = deque()
            local = []
            for _ in range(per_client):
                window.append((time.perf_counter(), svc.submit(clip)))
                while len(window) >= args.inflight:
                    t0, fut = window.popleft()
                    fut.result(timeout=600)
                    local.append(time.perf_counter() - t0)
            while window:
                t0, fut = window.popleft()
                fut.result(timeout=600)
                local.append(time.perf_counter() - t0)
            with lat_lock:
                latencies.extend(local)

        threads = [threading.Thread(target=client) for _ in range(args.clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return latencies, time.perf_counter() - t0

    # ---- phase 0: batcher-only ceiling (instant fake model, no device) ----
    class _InstantModel:
        """Host-side no-op with the forward contract: isolates the
        batcher machinery (queue, coalesce, pad, future fan-out)."""

        def forward(self, wav):
            z = np.zeros((wav.shape[0], 527), np.float32)
            return {"clipwise_output": z, "clipwise_logits": z}

    svc0 = InferenceService(_InstantModel(), batch_size=args.batch_size,
                            max_wait_ms=args.max_wait_ms, pcm_int16=True).start()
    lat0, wall0 = drive(svc0)
    svc0.stop()
    batcher_us_per_clip = wall0 / len(lat0) * 1e6
    batcher = {
        "clips": len(lat0),
        "wall_s": round(wall0, 3),
        "clips_per_sec": round(len(lat0) / wall0, 1),
        "overhead_us_per_clip": round(batcher_us_per_clip, 1),
    }
    print("batcher-only:", json.dumps(batcher), flush=True)

    # ---- phase 1: dynamic-batching service under concurrent load ----------
    svc = InferenceService(model, batch_size=args.batch_size,
                           max_wait_ms=args.max_wait_ms, pcm_int16=True).start()
    latencies, wall = drive(svc)
    svc.stop()

    n_done = len(latencies)
    lat = np.sort(np.array(latencies))
    service = {
        "clips": n_done,
        "wall_s": round(wall, 2),
        "clips_per_sec": round(n_done / wall, 1),
        "latency_p50_ms": round(float(lat[int(0.50 * n_done)]) * 1e3, 1),
        "latency_p95_ms": round(float(lat[int(0.95 * n_done)]) * 1e3, 1),
        "latency_p99_ms": round(float(lat[min(int(0.99 * n_done), n_done - 1)]) * 1e3, 1),
        "clients": args.clients,
        "inflight_per_client": args.inflight,
        "batch_size": args.batch_size,
        "max_wait_ms": args.max_wait_ms,
        "transport": "int16 PCM in, probs+logits f32 out, via dev relay "
                     "(~MB/s D2H - see NOTES.md; this is a relay-bound "
                     "lower bound on the service)",
        "batches": svc.stats["batches"],
    }
    print("service:", json.dumps(service), flush=True)

    # ---- phase 2: small-batch dependency-chained latency (bench_latency) --
    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.config import ConvNeXtConfig, FrontendConfig
    from audioset_convnext_inf_tpu.models import convnext as F
    from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

    cfg = ConvNeXtConfig(drop_path_rate=0.0, block_impl="xla_approx",
                         frontend=FrontendConfig(precision="default"))
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    frontend = LogMelFrontend(cfg.frontend, compute_dtype=jnp.bfloat16)

    @jax.jit
    def step(params, wav):
        probs = F.forward(params, wav, cfg, frontend=frontend,
                          compute_dtype=jnp.bfloat16)["clipwise_output"]
        return wav + 0.0 * jnp.sum(probs)

    chained = {}
    for b in args.latency_batches:
        wav = jax.device_put((rng.randn(b, CLIP_SAMPLES) * 0.1).astype(np.float32))
        wav = step(params, wav)
        _ = float(jnp.sum(wav))
        t0 = time.perf_counter()
        for _ in range(args.latency_iters):
            wav = step(params, wav)
        _ = float(jnp.sum(wav))
        chained[f"b{b}_ms"] = round((time.perf_counter() - t0) / args.latency_iters * 1e3, 2)
    print("chained latency:", json.dumps(chained), flush=True)

    artifact = {
        "metric": "serving_latency_and_service",
        "value": chained.get("b1_ms"),
        "unit": "ms/request (B=1, device-chained)",
        "vs_baseline": None,
        "detail": {
            "chained_latency_ms": dict(chained, iters=args.latency_iters,
                                       dtype="bfloat16", block_impl="xla_approx"),
            "dynamic_batching_service": service,
            "batcher_only": batcher,
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "LATENCY_r05.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({"metric": artifact["metric"], "b1_ms": artifact["value"],
                      "service_clips_per_sec": service["clips_per_sec"]}), flush=True)


if __name__ == "__main__":
    main()
