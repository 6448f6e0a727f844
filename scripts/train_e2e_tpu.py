"""End-to-end production-train certification on real TPU (round 4, item 3).

Drives ``cli/train.py`` — the FULL composition the reference runs in
pytorch/main.py:117-923: HDF5 -> BalancedTrainSampler -> prefetching
DataLoader -> device_put -> jitted train step, with eval-every-N,
interval checkpoints, a hard mid-run SIGKILL, and exact resume — at
flagship geometry (convnext_tiny dims 96-768) on the real chip.

Three sequential subprocess runs (never two TPU processes at once):
  A. straight:   0 -> 240 steps                              (workspace wsA)
  B. killed:     0 -> SIGKILL shortly after the 120-step checkpoint (wsB)
  C. resumed:    --resume-iteration 120 -> 240                        (wsB)
Certificate: params(A@240) == params(C@240) bit-exact, plus the loss
trajectory and eval mAP curve showing the recipe learns through the
real data plane. Writes TRAIN_E2E_r04.json.

Data: 16 tone classes (1-s 32 kHz int16 clips, distinct fundamentals,
random phase/amp/noise), one-hot into the 527-dim AudioSet target — short
clips keep host->device inside the dev tunnel's ~10 MB/s budget
(NOTES.md deployment notes); geometry stays flagship.
"""

from __future__ import annotations

import json
import os
import re
import signal
import subprocess
import sys
import time

import h5py
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_CLASSES = 527
N_TONE_CLASSES = 16
SR = 32000
CLIP_SAMPLES = SR  # 1 s
STEPS = 240
KILL_AFTER_CKPT = 120


def make_tone_hdf5(directory: str, name: str, n_clips: int, seed: int):
    """Packed waveform + index HDF5 pair of learnable tone clips."""
    rng = np.random.RandomState(seed)
    os.makedirs(directory, exist_ok=True)
    packed = os.path.join(directory, f"{name}_waveforms.h5")
    index = os.path.join(directory, f"{name}_indexes.h5")
    t = np.arange(CLIP_SAMPLES) / SR
    names = np.array([f"Y{name[:1]}{i:06d}xxx_0_1".encode() for i in range(n_clips)])
    waveforms = np.empty((n_clips, CLIP_SAMPLES), np.int16)
    targets = np.zeros((n_clips, N_CLASSES), dtype=bool)
    for i in range(n_clips):
        k = i % N_TONE_CLASSES
        f0 = 150.0 * (k + 1)
        amp = rng.uniform(0.25, 0.7)
        wav = amp * np.sin(2 * np.pi * f0 * t + rng.uniform(0, 2 * np.pi))
        wav += 0.3 * amp * np.sin(2 * np.pi * 2 * f0 * t + rng.uniform(0, 2 * np.pi))
        wav += rng.normal(0, 0.01, CLIP_SAMPLES)
        waveforms[i] = np.clip(wav * 32767, -32767, 32767).astype(np.int16)
        targets[i, k] = True
    with h5py.File(packed, "w") as hf:
        hf.create_dataset("audio_name", data=names)
        hf.create_dataset("waveform", data=waveforms)
        hf.create_dataset("target", data=targets)
        hf.attrs.create("sample_rate", data=SR, dtype=np.int32)
    with h5py.File(index, "w") as hf:
        hf.create_dataset("audio_name", data=names)
        hf.create_dataset("target", data=targets)
        hf.create_dataset("hdf5_path", data=[packed.encode()] * n_clips)
        hf.create_dataset("index_in_hdf5", data=np.arange(n_clips, dtype=np.int32))
    return packed, index


def train_argv(train_idx: str, eval_idx: str, workspace: str, early_stop: int,
               resume: int = 0):
    argv = [
        sys.executable, "-u", "-m", "audioset_convnext_inf_tpu.cli.train",
        "--train-indexes", train_idx,
        "--eval-indexes", eval_idx,
        "--model", "convnext_tiny",
        "--batch-size", "16",
        "--sampler", "balanced",
        "--mixup-alpha", "1.0",
        "--bf16", "--block-impl", "xla_approx",
        "--max-lr", "4e-4",
        "--total-steps", str(STEPS),
        "--early-stop", str(early_stop),
        "--eval-interval", "80",
        "--checkpoint-interval", str(KILL_AFTER_CKPT),
        "--eval-batch-size", "64",
        "--num-workers", "2",
        "--workspace", workspace,
        "--seed", "1234",
    ]
    if resume:
        argv += ["--resume-iteration", str(resume)]
    return argv


def run(argv, logfile: str, kill_after_marker: str | None = None,
        kill_grace_s: float = 6.0, timeout_s: float = 3600.0) -> int:
    """Run one train subprocess; optionally SIGKILL it shortly after a log
    marker appears (the hard mid-run failure the resume path must survive)."""
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    with open(logfile, "wb") as out:
        proc = subprocess.Popen(argv, stdout=out, stderr=subprocess.STDOUT,
                                cwd=REPO, env=env)
        t0 = time.time()
        marker_seen_at = None
        try:
            while proc.poll() is None:
                time.sleep(1.0)
                if time.time() - t0 > timeout_s:
                    proc.kill()
                    raise TimeoutError(f"train subprocess exceeded {timeout_s}s")
                if kill_after_marker and marker_seen_at is None:
                    with open(logfile, "rb") as f:
                        if kill_after_marker.encode() in f.read():
                            marker_seen_at = time.time()
                if marker_seen_at and time.time() - marker_seen_at > kill_grace_s:
                    proc.send_signal(signal.SIGKILL)  # no cleanup, no atexit
                    proc.wait()
                    return -9
        finally:
            if proc.poll() is None:
                proc.kill()
    return proc.returncode


def parse_log(logfile: str):
    losses, evals = [], []
    pat_loss = re.compile(r"iteration (\d+) loss ([-\d.]+)")
    pat_eval = re.compile(r"iter (\d+) (\w+) mAP ([\d.]+) AUC ([\d.]+)")
    with open(logfile, "r", errors="replace") as f:
        for line in f:
            m = pat_loss.search(line)
            if m:
                losses.append([int(m.group(1)), float(m.group(2))])
            m = pat_eval.search(line)
            if m:
                evals.append([int(m.group(1)), m.group(2), float(m.group(3)),
                              float(m.group(4))])
    return losses, evals


def load_params(path: str):
    sys.path.insert(0, REPO)
    from audioset_convnext_inf_tpu.checkpoint import load_checkpoint

    return load_checkpoint(path)["params"]


def main():
    import tempfile

    work = tempfile.mkdtemp(prefix="train_e2e_")
    _, train_idx = make_tone_hdf5(work, "train", 96, seed=0)
    _, eval_idx = make_tone_hdf5(work, "eval", 64, seed=1)
    ws_a, ws_b = os.path.join(work, "wsA"), os.path.join(work, "wsB")

    print("== run A: straight 0->%d ==" % STEPS, flush=True)
    t0 = time.time()
    rc_a = run(train_argv(train_idx, eval_idx, ws_a, STEPS),
               os.path.join(work, "runA.log"))
    t_a = time.time() - t0
    print("run A rc=%s (%.0f s)" % (rc_a, t_a), flush=True)
    assert rc_a == 0

    print("== run B: SIGKILL after the %d-step checkpoint ==" % KILL_AFTER_CKPT,
          flush=True)
    rc_b = run(train_argv(train_idx, eval_idx, ws_b, STEPS),
               os.path.join(work, "runB.log"),
               kill_after_marker=f"checkpoint saved at iteration {KILL_AFTER_CKPT}")
    print("run B rc=%s (killed)" % rc_b, flush=True)
    assert rc_b == -9, f"expected SIGKILL exit, got {rc_b}"

    print("== run C: resume %d->%d ==" % (KILL_AFTER_CKPT, STEPS), flush=True)
    rc_c = run(train_argv(train_idx, eval_idx, ws_b, STEPS, resume=KILL_AFTER_CKPT),
               os.path.join(work, "runC.log"))
    print("run C rc=%s" % rc_c, flush=True)
    assert rc_c == 0

    ckpt_a = os.path.join(ws_a, "checkpoints", "convnext_tiny", f"{STEPS}_iterations")
    ckpt_c = os.path.join(ws_b, "checkpoints", "convnext_tiny", f"{STEPS}_iterations")
    import jax

    pa, pc = load_params(ckpt_a), load_params(ckpt_c)
    leaves_a, tree_a = jax.tree_util.tree_flatten(pa)
    leaves_c, tree_c = jax.tree_util.tree_flatten(pc)
    assert tree_a == tree_c
    mism = [i for i, (a, c) in enumerate(zip(leaves_a, leaves_c))
            if not np.array_equal(np.asarray(a), np.asarray(c))]
    exact = not mism
    print("resume bit-exact:", exact, ("mismatched leaves: %d" % len(mism)), flush=True)

    losses_a, evals_a = parse_log(os.path.join(work, "runA.log"))
    losses_c, evals_c = parse_log(os.path.join(work, "runC.log"))
    artifact = {
        "metric": "train_cli_e2e_tpu",
        "pass": bool(exact and rc_a == 0 and rc_c == 0),
        "detail": {
            "backend": "tpu",
            "geometry": "convnext_tiny dims 96-768, 28.2M params, 1-s clips",
            "pipeline": "HDF5 -> BalancedTrainSampler -> DataLoader(2 workers, "
                        "prefetch) -> device_put -> jitted step; mixup 1.0, bf16 "
                        "xla_approx, AdamW+OneCycle; eval every 80, ckpt every 120",
            "steps": STEPS,
            "run_a_seconds": round(t_a, 1),
            "kill": f"SIGKILL ~6 s after the {KILL_AFTER_CKPT}-step checkpoint",
            "resume_bit_exact_vs_straight": exact,
            "loss_trajectory_straight": losses_a,
            "eval_curve_straight": evals_a,
            "loss_trajectory_resumed": losses_c,
            "eval_curve_resumed": evals_c,
        },
    }
    with open(os.path.join(REPO, "TRAIN_E2E_r04.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({k: artifact[k] for k in ("metric", "pass")}), flush=True)
    print("workdir:", work, flush=True)


if __name__ == "__main__":
    main()
