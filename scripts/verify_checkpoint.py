#!/usr/bin/env python
"""Checkpoint-arrival gate: one command that proves parity with the
published reference checkpoint the moment its weights are available.

Usage:
    python scripts/verify_checkpoint.py convnext_tiny_471mAP.pth \
        [--wav tests/fixtures/f62-S-v2swA_200000_210000.wav] \
        [--eval-indexes eval.h5 --eval-waveforms-dir <dir>] [--bf16]

Checks, in order (matching the reference's own acceptance evidence):
 1. parameter count 28,222,767 (README.md:49, demo_convnext.sbatch.output:3)
 2. golden demo prediction on the checked-in sample: indexes
    [0 137 138 139 151 506] at threshold 0.25
    (scripts/demo_convnext.sbatch.output:10)
 3. output shapes (1,527) / scene (1,768) / frame (1,768,31,7)
 4. optionally, full AudioSet eval mAP/AUC/d' vs the published
    0.471 / 0.973 / 3.071 (README.md:32-38) when eval HDF5s are given.

Exit code 0 = every requested check passed.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

GOLDEN_INDEXES = [0, 137, 138, 139, 151, 506]
GOLDEN_PARAMS = 28_222_767
PUBLISHED = {"mAP": 0.471, "mAUC": 0.973, "dprime": 3.071}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("checkpoint", help=".pth / .safetensors / HF id")
    ap.add_argument("--wav", default="tests/fixtures/f62-S-v2swA_200000_210000.wav")
    ap.add_argument("--threshold", type=float, default=0.25)
    ap.add_argument("--eval-indexes", default=None, help="eval index HDF5 for mAP check")
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--map-tolerance", type=float, default=0.002)
    ap.add_argument("--bf16", action="store_true", help="also verify the bf16 serving path")
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from scipy.io import wavfile

    from audioset_convnext_inf_tpu.models.api import ConvNeXt
    from audioset_convnext_inf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    failures = []

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name}{': ' + detail if detail else ''}")
        if not ok:
            failures.append(name)

    model = ConvNeXt.from_pretrained(args.checkpoint)

    # 1. parameter count
    n = model.count_parameters()
    check("param count", n == GOLDEN_PARAMS, f"{n:,} (want {GOLDEN_PARAMS:,})")

    # 2/3. golden demo prediction + shapes
    sr, data = wavfile.read(args.wav)
    wav = (data / 32768.0).astype(np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=1)
    wav = np.pad(wav, (0, max(0, 320000 - len(wav))))[None, :320000]

    dtypes = [("f32", jnp.float32)] + ([("bf16", jnp.bfloat16)] if args.bf16 else [])
    for tag, dtype in dtypes:
        m = model if dtype == jnp.float32 else ConvNeXt(model.cfg, model.params, compute_dtype=dtype)
        out = m.forward(wav)
        probs = np.asarray(out["clipwise_output"])
        check(f"logits shape ({tag})", probs.shape == (1, 527), str(probs.shape))
        pred = np.where(probs[0] > args.threshold)[0].tolist()
        check(
            f"golden demo indexes ({tag})",
            pred == GOLDEN_INDEXES,
            f"{pred} (want {GOLDEN_INDEXES})",
        )
    scene = np.asarray(model.forward_scene_embeddings(wav))
    frame = np.asarray(model.forward_frame_embeddings(wav))
    check("scene embedding shape", scene.shape == (1, 768), str(scene.shape))
    check("frame embedding shape", frame.shape == (1, 768, 31, 7), str(frame.shape))

    # 4. eval-set metric parity
    if args.eval_indexes:
        from audioset_convnext_inf_tpu.data.hdf5_dataset import AudioSetDataset
        from audioset_convnext_inf_tpu.data.loader import DataLoader
        from audioset_convnext_inf_tpu.data.samplers import EvaluateSampler
        from audioset_convnext_inf_tpu.engine.evaluator import Evaluator
        from audioset_convnext_inf_tpu.engine.metrics import summarize

        sampler = EvaluateSampler(args.eval_indexes, args.batch_size)
        loader = DataLoader(AudioSetDataset(keep_int16=True), sampler, num_workers=8)
        dtype = jnp.bfloat16 if args.bf16 else jnp.float32
        cfg_eval = model.cfg
        if args.bf16 and cfg_eval.block_impl == "xla":
            # gate the configuration that actually serves: bf16 ships the
            # tanh-GELU path + fused stage-3/4 kernels (models/api.py)
            import dataclasses

            cfg_eval = dataclasses.replace(cfg_eval, block_impl="xla_approx")
        stats = Evaluator(model.params, cfg_eval, compute_dtype=dtype).evaluate(loader)
        s = summarize(stats)
        print(f"eval: mAP={s['mAP']:.4f} mAUC={s['mAUC']:.4f} d'={s['dprime']:.4f}")
        check(
            "published mAP",
            abs(s["mAP"] - PUBLISHED["mAP"]) <= args.map_tolerance,
            f"{s['mAP']:.4f} vs {PUBLISHED['mAP']} (tol {args.map_tolerance})",
        )
        check("published AUC", abs(s["mAUC"] - PUBLISHED["mAUC"]) <= 0.002, f"{s['mAUC']:.4f}")

    print("\n" + ("ALL CHECKS PASSED" if not failures else f"FAILED: {failures}"))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
