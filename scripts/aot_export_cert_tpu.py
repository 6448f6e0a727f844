"""AOT serving-export certificate on real TPU (round 4).

Exports the flagship bf16 serving configuration (tanh-GELU blocks + fused
Pallas stage-3/4 kernels + single-pass bf16 frontend, i.e. exactly what
bench.py runs) to a serialized StableHLO bundle via engine/aot_export.py,
reloads it from disk, and gates:

  1. the reloaded programs reproduce the live model (max |dprobs| small -
     same program, separate XLA compilation, so ~ULP drift only);
  2. the pad-to-bucket loader contract holds for a non-bucket batch;
  3. artifact inventory (program count, bytes) is recorded.

Writes AOT_EXPORT_r04.json at the repo root and prints one JSON line.

Run:  cd /root/repo && python scripts/aot_export_cert_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (1, 16)  # B=16 exercises the fused Pallas kernels; B=1 the XLA path


def main() -> None:
    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import tempfile

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.config import CLIP_SAMPLES
    from audioset_convnext_inf_tpu.engine.aot_export import load_bundle, save_bundle
    from audioset_convnext_inf_tpu.models.api import create_model

    backend = jax.default_backend()
    model = create_model("convnext_tiny", compute_dtype=jnp.bfloat16,
                         drop_path_rate=0.0, seed=0)

    rng = np.random.RandomState(0)
    pcm = (rng.randn(5, CLIP_SAMPLES) * 3000).astype(np.int16)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bundle")
        manifest = save_bundle(model, path, batch_sizes=BATCHES, pcm=True)
        sizes = {
            f: os.path.getsize(os.path.join(path, f))
            for f in sorted(os.listdir(path))
        }
        bundle = load_bundle(path)

        # B=5 pads to bucket 16 (fused-kernel program); compare on-device
        # outputs via ONE small D2H each (B,527 probs - relay-safe).
        out = np.asarray(bundle(pcm)["clipwise_output"], np.float32)
        ref = np.asarray(model.forward(pcm)["clipwise_output"], np.float32)
        max_d = float(np.abs(out - ref).max())
        top1 = float((out.argmax(1) == ref.argmax(1)).mean())

        out1 = np.asarray(bundle(pcm[:1])["clipwise_output"], np.float32)
        ref1 = ref[:1]
        max_d1 = float(np.abs(out1 - ref1).max())

    result = {
        "metric": "aot_export_tpu",
        "value": max_d,
        "unit": "max |probs delta| reloaded-vs-live (bf16 serving config)",
        "pass": bool(max_d < 2e-3 and max_d1 < 2e-3 and top1 == 1.0),
        "detail": {
            "backend": backend,
            "model": "convnext_tiny bf16 auto_fast_serving (fused Pallas s3/s4)",
            "input": "int16 PCM (B, 320000), on-device decode",
            "batch_buckets": list(BATCHES),
            "tested_batch": 5,
            "max_probs_delta_b5_via_b16": max_d,
            "max_probs_delta_b1": max_d1,
            "top1_agreement": top1,
            "artifact_bytes": sizes,
            "reference": "deployment analog of convert_pytorch_ckpt_to_safetensors.py:11-19",
        },
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "AOT_EXPORT_r04.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
