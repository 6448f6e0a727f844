"""End-to-end evaluate-CLI certification on real TPU (round 4).

Drives ``cli/evaluate.py`` - the rebuild of the reference's headline eval
workflow (evaluate_convnext_on_audioset.py:22-118: balanced + eval HDF5
index sets, batch 256, mAP/AUC/d-prime) - through the FULL composition on
the chip: checkpoint load via from_pretrained -> HDF5 -> EvaluateSampler ->
prefetching DataLoader (int16 to the device) -> mesh-sharded Evaluator ->
host sklearn metrics. The model first learns a 16-class tone task through
``cli/train.py`` (the TRAIN_E2E_r04 pipeline), so the certificate detects
any misalignment anywhere in the chain: shuffled clips, broken label join,
wrong pad handling, or metric bugs all crash mAP toward chance (0.0625).

Gates: eval-subset mAP >= 0.9 at batch 256 in the bf16 serving config,
both subsets evaluated, d-prime finite. Writes EVAL_E2E_r05.json.

Run:  cd /root/repo && python scripts/eval_e2e_tpu.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from train_e2e_tpu import make_tone_hdf5  # noqa: E402  (same tone fixture)

STEPS = 720  # TRAIN_E2E reached test mAP ~0.44 by 160 steps; 720 overfits


def run(argv, logfile, timeout_s=3600.0) -> int:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(logfile, "wb") as out:
        return subprocess.run(argv, stdout=out, stderr=subprocess.STDOUT,
                              cwd=REPO, env=env, timeout=timeout_s).returncode


def main() -> None:
    import tempfile

    work = tempfile.mkdtemp(prefix="eval_e2e_")
    _, train_idx = make_tone_hdf5(work, "train", 96, seed=0)
    _, bal_idx = make_tone_hdf5(work, "bal", 256, seed=2)
    _, eval_idx = make_tone_hdf5(work, "eval", 512, seed=1)
    ws = os.path.join(work, "ws")

    print(f"== train {STEPS} steps through cli/train.py ==", flush=True)
    t0 = time.time()
    rc = run([
        sys.executable, "-u", "-m", "audioset_convnext_inf_tpu.cli.train",
        "--train-indexes", train_idx, "--eval-indexes", eval_idx,
        "--model", "convnext_tiny", "--batch-size", "16",
        "--sampler", "balanced", "--mixup-alpha", "1.0",
        "--bf16", "--block-impl", "xla_approx", "--max-lr", "4e-4",
        "--total-steps", str(STEPS), "--early-stop", str(STEPS),
        "--eval-interval", str(STEPS + 1),  # no mid-run evals
        "--checkpoint-interval", str(STEPS),
        "--eval-batch-size", "64", "--num-workers", "2",
        "--workspace", ws, "--seed", "1234",
    ], os.path.join(work, "train.log"))
    t_train = time.time() - t0
    print(f"train rc={rc} ({t_train:.0f} s)", flush=True)
    assert rc == 0, open(os.path.join(work, "train.log")).read()[-2000:]

    ckpt = os.path.join(ws, "checkpoints", "convnext_tiny", f"{STEPS}_iterations")
    print("== evaluate CLI, batch 256, bf16 + int16 ingest ==", flush=True)
    t0 = time.time()
    log = os.path.join(work, "eval.log")
    rc = run([
        sys.executable, "-u", "-m", "audioset_convnext_inf_tpu.cli.evaluate",
        "--checkpoint", ckpt, "--eval-indexes", eval_idx,
        "--bal-indexes", bal_idx, "--batch-size", "256",
        "--num-workers", "2", "--dtype", "bfloat16", "--keep-int16",
    ], log)
    t_eval = time.time() - t0
    print(f"evaluate rc={rc} ({t_eval:.0f} s)", flush=True)
    assert rc == 0, open(log).read()[-2000:]

    text = open(log).read()
    print(text[-800:], flush=True)
    pat = re.compile(
        r"([\w ]+): mAP: ([\d.]+), AUC: ([\d.]+), d-prime: ([\d.naif-]+)")
    subsets = {m.group(1): (float(m.group(2)), float(m.group(3)), m.group(4))
               for m in pat.finditer(text)}
    assert {"Balanced train", "Eval"} <= set(subsets), subsets
    e_map, e_auc, e_dp = subsets["Eval"]
    b_map, b_auc, b_dp = subsets["Balanced train"]

    result = {
        "metric": "evaluate_cli_e2e_tpu",
        "value": e_map,
        "unit": "eval-subset mAP (16 tone classes, chance 0.0625)",
        # d-prime = sqrt(2)*ppf(AUC) is legitimately inf at AUC 1.0
        "pass": bool(e_map >= 0.9 and b_map >= 0.9 and float(e_dp) > 3.0),
        "detail": {
            "backend": "tpu",
            "pipeline": "from_pretrained(native ckpt) -> HDF5 -> "
                        "EvaluateSampler(256) -> DataLoader(int16, 2 workers)"
                        " -> sharded Evaluator -> sklearn mAP/AUC/d-prime",
            "config": "bf16 xla_approx + fused Pallas s3/s4, --keep-int16",
            "train_steps": STEPS,
            "train_seconds": round(t_train, 1),
            "eval_seconds_both_subsets": round(t_eval, 1),
            "bal": {"n": 256, "mAP": b_map, "AUC": b_auc, "d_prime": b_dp},
            "eval": {"n": 512, "mAP": e_map, "AUC": e_auc, "d_prime": e_dp},
            "reference": "evaluate_convnext_on_audioset.py:22-118",
        },
    }
    with open(os.path.join(REPO, "EVAL_E2E_r05.json"), "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
