"""Serving-config mAP parity at real geometry, on REAL TPU hardware.

tests/test_serving_parity.py proves the production serving configuration
(bf16 + tanh-GELU "xla_approx" blocks + fused stage-3/4 HWBC kernels +
frontend precision "high") holds mAP against the reference's own torch f32
pipeline — but it runs the fused kernels under the Pallas CPU *interpreter*.
This script closes the remaining gap: it runs the ACTUAL Mosaic kernels on
the TPU at the real convnext_tiny geometry (dims 96..768, 10-s clips,
fused stages see (63,14) and (31,7)) and compares, at mAP level, against
the reference pipeline (reference convnext.py:287-329 forward +
evaluate.py:22-60 metric math) executed in torch f32 on the host.

Writes SERVING_PARITY_r03.json at the repo root and prints one JSON line.

Run:  cd /root/repo && python scripts/serving_parity_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import torch

    from tests.reference_shim import load_reference_modules

    ref_convnext, _ref_evaluate, ref_pytorch_utils = load_reference_modules()

    import jax
    import jax.numpy as jnp

    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from audioset_convnext_inf_tpu.checkpoint.convert import torch_state_dict_to_params
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig, FrontendConfig
    from audioset_convnext_inf_tpu.engine import metrics as M
    from audioset_convnext_inf_tpu.engine.evaluator import Evaluator
    from audioset_convnext_inf_tpu.parallel.mesh import get_mesh

    backend = jax.default_backend()
    assert backend in ("tpu", "axon"), (
        f"this script certifies the real Mosaic kernels; backend is {backend!r}"
    )

    # --- reference model: real tiny geometry, non-trivial stats ----------
    torch.manual_seed(3)
    model = ref_convnext.convnext_tiny(
        pretrained=False, strict=False, drop_path_rate=0.0, after_stem_dim=[252, 56]
    )
    with torch.no_grad():
        model.bn0.running_mean.normal_(0, 0.5)
        model.bn0.running_var.uniform_(0.8, 1.5)
        model.head_audioset.weight.add_(
            0.02 * torch.randn_like(model.head_audioset.weight)
        )
    model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    # --- eval set: tone clips (see test_serving_parity.py docstring) -----
    n_clips, batch, ncls = 64, 32, 527  # batch % 16 == 0 arms the fused path
    rng = np.random.RandomState(7)
    t = np.arange(320000) / 32000.0
    freqs = 150.0 * (2.0 ** (np.arange(n_clips) % 12 / 1.7))
    wav = np.stack(
        [
            (
                0.4 * np.sin(2 * np.pi * f * t + rng.rand() * 6.28)
                + 0.1 * rng.randn(320000)
            ).astype(np.float32)
            for f in freqs
        ]
    )
    tgt = (rng.rand(n_clips, ncls) < 0.12).astype(np.float32)
    for i in range(n_clips):
        tgt[i, i % ncls] = 1.0
    loader = [
        {"waveform": wav[i : i + batch], "target": tgt[i : i + batch]}
        for i in range(0, n_clips, batch)
    ]

    # --- reference pipeline, torch f32 on host ---------------------------
    t0 = time.perf_counter()
    ref_out = ref_pytorch_utils.forward(model, loader, return_target=True)
    ref_s = time.perf_counter() - t0
    ref_stats = M.evaluate_clipwise(ref_out["clipwise_output"], ref_out["target"])
    map_ref = float(np.nanmean(ref_stats["average_precision"]))
    auc_ref = float(np.nanmean(ref_stats["auc"]))

    # --- our production serving config on the TPU ------------------------
    cfg = ConvNeXtConfig(
        drop_path_rate=0.0,
        block_impl="xla_approx",
        frontend=FrontendConfig(precision="high"),
    )
    params = torch_state_dict_to_params(sd, cfg)
    ev = Evaluator(params, cfg, mesh=get_mesh(), compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    ours = ev.infer_probs(loader)
    tpu_s = time.perf_counter() - t0
    stats = M.evaluate_clipwise(ours["clipwise_output"], ours["target"])
    map_ours = float(np.nanmean(stats["average_precision"]))
    auc_ours = float(np.nanmean(stats["auc"]))

    delta_map = abs(map_ours - map_ref)
    max_prob_delta = float(
        np.max(np.abs(ours["clipwise_output"] - ref_out["clipwise_output"]))
    )
    # per-clip top-6 rank agreement (the demo contract is thresholded ranks)
    top_ref = np.argsort(-ref_out["clipwise_output"], axis=1)[:, :6]
    top_ours = np.argsort(-ours["clipwise_output"], axis=1)[:, :6]
    rank_agree = float(
        np.mean([len(set(a) & set(b)) / 6.0 for a, b in zip(top_ref, top_ours)])
    )

    result = {
        "metric": "serving_config_map_delta_vs_reference_f32",
        "value": round(delta_map, 6),
        "unit": "mAP delta",
        "pass": bool(delta_map < 5e-3),
        "detail": {
            "backend": backend,
            "geometry": "convnext_tiny dims 96-768, 10 s clips, fused stages (63,14)/(31,7)",
            "serving_config": "bf16 + xla_approx (tanh GELU) + fused stage-3/4 Mosaic kernels + frontend 'high'",
            "n_clips": n_clips,
            "batch": batch,
            "map_reference_f32": round(map_ref, 6),
            "map_serving_bf16_tpu": round(map_ours, 6),
            "auc_reference_f32": round(auc_ref, 6),
            "auc_serving_bf16_tpu": round(auc_ours, 6),
            "max_prob_delta": round(max_prob_delta, 6),
            "top6_rank_agreement": round(rank_agree, 4),
            "reference_host_seconds": round(ref_s, 1),
            "tpu_seconds": round(tpu_s, 1),
        },
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "SERVING_PARITY_r03.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
