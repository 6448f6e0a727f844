"""HTTP tagging service CLI.

    python -m audioset_convnext_inf_tpu.cli.serve [--port 8787] \
        [--checkpoint CKPT | --bundle AOT_DIR] [--batch-size 32] [--top-k 10]

``--bundle`` serves from an AOT export bundle (cli/export_serving.py):
the box needs neither model code nor weights - the serialized StableHLO
programs carry both.

Endpoints (stdlib http.server, threaded; dynamic batching underneath):

  GET  /healthz              -> {"status": "ok", ...service stats}
  POST /tag                  -> body: WAV bytes, raw float32 PCM, or raw
                                int16 PCM @32 kHz (Content-Type: audio/wav |
                                application/octet-stream |
                                application/pcm-int16); 16-bit WAV stays
                                int16 to the device (half the H2D bytes).
                                Audio longer than 10 s is windowed into
                                10-s rows that ride the dynamic batcher and
                                max-reduced (engine/infer.py::tag_long_audio
                                semantics; response gains "num_windows").
                                response: {"labels": [...], "probs": [...],
                                           "indexes": [...]}
  POST /embed                -> same body; response: {"embedding": [768 floats]}
                                (pad/crop to 10 s, extract_embeddings.py
                                load_clip semantics)
"""

from __future__ import annotations

import argparse
import io
import json


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--bundle", default=None,
                        help="serve from an AOT export bundle directory "
                             "(cli/export_serving.py) - no model code or "
                             "weights are built; overrides --checkpoint/--dtype")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--max-wait-ms", type=float, default=20.0)
    parser.add_argument("--top-k", type=int, default=10)
    parser.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32"],
                        help="bfloat16 enables the fast tanh-GELU serving path")
    parser.add_argument("--mesh", action="store_true",
                        help="shard each coalesced batch across ALL local "
                             "devices (engine/service.py::ShardedModel); "
                             "single-chip serving doesn't need this")
    args = parser.parse_args(argv)
    if args.mesh and args.bundle:
        # pure argument validation, before any bundle deserialization
        parser.error("--mesh shards the live model; AOT bundles are "
                     "compiled for one device (export per-device bundles "
                     "instead)")

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from audioset_convnext_inf_tpu.engine.service import InferenceService
    from audioset_convnext_inf_tpu.labels import read_audioset_label_tags
    from audioset_convnext_inf_tpu.models import ConvNeXt, convnext_tiny

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.bundle:
        from audioset_convnext_inf_tpu.engine.aot_export import (
            BundleModel,
            load_bundle,
        )

        model = BundleModel(load_bundle(args.bundle))
        if model.max_batch is not None and args.batch_size > model.max_batch:
            print(f"batch-size {args.batch_size} > largest exported bucket; "
                  f"using {model.max_batch}")
            args.batch_size = model.max_batch
    elif args.checkpoint:
        model = ConvNeXt.from_pretrained(args.checkpoint, compute_dtype=compute_dtype)
    else:
        model = convnext_tiny(drop_path_rate=0.0, compute_dtype=compute_dtype)
        print("WARNING: no checkpoint given - serving random weights")

    if args.mesh:
        from audioset_convnext_inf_tpu.engine.service import ShardedModel

        fused_eligible = model.cfg.block_impl == "xla_approx"
        model = ShardedModel(model)
        n_dev = model.mesh.size
        # the fused Pallas serving kernels gate on the PER-DEVICE batch
        # being a multiple of 16 (models/convnext.py); shard_map sees
        # batch_size/n_dev rows per device, so round the service batch up
        # to 16*n_dev or multi-chip serving silently runs the slower
        # unfused XLA trunk. Only worth padded rows when the fused config
        # is actually active ("xla_approx", the bf16 serving default) -
        # the f32 "xla" trunk never fires the gate, so light-load requests
        # would pay up-to-quantum padding for zero benefit.
        quantum = 16 * n_dev
        if fused_eligible and args.batch_size % quantum:
            new_bs = -(-args.batch_size // quantum) * quantum
            print(f"--mesh: raising batch-size {args.batch_size} -> {new_bs} "
                  f"(fused kernels need per-device batch % 16 == 0 over "
                  f"{n_dev} devices)")
            args.batch_size = new_bs
        print(f"mesh serving over {n_dev} devices")
    service = InferenceService(model, batch_size=args.batch_size,
                               max_wait_ms=args.max_wait_ms,
                               pcm_int16=True).start()
    labels = read_audioset_label_tags()

    def decode_audio(body: bytes, content_type: str) -> np.ndarray:
        if "wav" in content_type or body[:4] == b"RIFF":
            from scipy.io import wavfile

            from audioset_convnext_inf_tpu.data.audio_io import (
                normalize_pcm,
                resample_poly,
            )

            sr, data = wavfile.read(io.BytesIO(body))
            # the common serving case (16-bit mono 32 kHz WAV) stays int16
            # end-to-end: the batcher ships PCM and the device decodes,
            # halving host->device bytes (engine/service.py submit).
            # Scale convention: the device decode divides by 32767 (the
            # reference's HDF5 utilities.py:226 convention), while the
            # normalize_pcm fallback below divides by 32768 (soundfile's) -
            # a deliberate 3.1e-5 gain difference between the two routes,
            # two orders below the certified serving prob delta (6.5e-3).
            if data.dtype == np.int16 and data.ndim == 1 and sr == 32000:
                return data
            x = normalize_pcm(data)  # int16/int32/uint8/float -> [-1,1] mono
            if sr != 32000:
                x = resample_poly(x, sr, 32000)
            return x
        if "pcm-int16" in content_type:  # raw little-endian int16 PCM @32k
            return np.frombuffer(body, dtype="<i2")
        return np.frombuffer(body, dtype=np.float32)

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, obj) -> None:
            payload = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", **service.stats})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(length)
                wav = decode_audio(body, self.headers.get("Content-Type", ""))
                if self.path == "/tag":
                    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES
                    from audioset_convnext_inf_tpu.engine.infer import sliding_windows

                    extra = {}
                    if len(wav) > CLIP_SAMPLES:
                        # long audio: non-overlapping 10-s windows submitted
                        # as independent clips (the batcher coalesces them
                        # into full device batches), max-reduced over
                        # windows - tag_long_audio's default semantics.
                        # int16 windows stay int16 (sliding_windows is
                        # dtype-preserving) so the on-device /32767 decode
                        # applies. Submit in bounded chunks, resolving as we
                        # go, so one clip longer than max_queued windows
                        # doesn't trip backpressure on an idle server.
                        windows, n = sliding_windows(wav)
                        chunk = max(1, service.max_queued // 2)
                        rows = []
                        for s in range(0, len(windows), chunk):
                            futs = [service.submit(w)
                                    for w in windows[s : s + chunk]]
                            rows += [f.result(timeout=600)["clipwise_output"]
                                     for f in futs]
                        probs = np.stack(rows)[:n].max(axis=0)
                        extra["num_windows"] = int(n)
                    else:
                        probs = service.tag(wav)["clipwise_output"]
                    top = np.argsort(probs)[::-1][: args.top_k]
                    self._send(200, {
                        "indexes": [int(i) for i in top],
                        "labels": [labels.ix_to_lb[int(i)] for i in top],
                        "probs": [float(probs[i]) for i in top],
                        **extra,
                    })
                elif self.path == "/embed":
                    wav2 = wav[: 320000]
                    if len(wav2) < 320000:
                        wav2 = np.pad(wav2, (0, 320000 - len(wav2)))
                    emb = np.asarray(model.forward_scene_embeddings(wav2[None, :]))[0]
                    self._send(200, {"embedding": [float(v) for v in emb]})
                else:
                    self._send(404, {"error": "unknown path"})
            except Exception as e:  # noqa: BLE001
                from audioset_convnext_inf_tpu.engine.service import ServiceOverloaded

                if isinstance(e, ServiceOverloaded):
                    self._send(429, {"error": "overloaded, retry later"})
                else:
                    self._send(400, {"error": repr(e)})

        def log_message(self, fmt, *a):  # quiet
            pass

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port} (batch {args.batch_size})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
