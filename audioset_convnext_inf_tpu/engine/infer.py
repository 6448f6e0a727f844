"""Inference front-ends: single-clip tagging, embedding extraction,
long-audio sliding windows.

Mirrors the reference entry points demo_convnext.py (tagging at a
probability threshold), extract_embeddings.py (per-file logits/embeddings)
and adds the long-audio API SURVEY.md section 5.7 calls for: arbitrary-length
audio split into 10-s windows that ride the device mesh as extra batch
(windows are independent => embarrassingly parallel).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, SAMPLE_RATE
from audioset_convnext_inf_tpu.data.audio_io import pad_or_truncate, read_wav
from audioset_convnext_inf_tpu.labels import read_audioset_label_tags


def load_clip(path: str, clip_samples: int = CLIP_SAMPLES, sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """Load + resample + pad/crop a file to one (1, clip_samples) clip
    (demo_convnext.py:52-69 semantics)."""
    wav, _ = read_wav(path, target_sr=sample_rate)
    return pad_or_truncate(wav, clip_samples)[None, :].astype(np.float32)


def tag_clip(
    model,
    waveform: np.ndarray,
    threshold: float = 0.25,
    labels_csv: Optional[str] = None,
) -> Dict[str, object]:
    """Tag one clip: indexes + label names above threshold (demo_convnext.py:85-92)."""
    out = model.forward(waveform)
    probs = np.asarray(out["clipwise_output"])[0]
    idx = np.where(probs > threshold)[0]
    lm = read_audioset_label_tags(labels_csv)
    return {
        "probs": probs,
        "logits": np.asarray(out["clipwise_logits"])[0],
        "indexes": idx,
        "labels": [lm.ix_to_lb[int(i)] for i in idx],
    }


def sliding_windows(
    waveform: np.ndarray,
    window_samples: int = CLIP_SAMPLES,
    hop_samples: Optional[int] = None,
) -> Tuple[np.ndarray, int]:
    """Split (N,) audio into (num_windows, window_samples), zero-padding the
    tail. Returns (windows, num_windows).

    dtype: int16 PCM stays int16 (windows ride the serving path's on-device
    /32767 decode - models/api.py, engine/service.py submit); anything else
    converts to float32. Casting int16 to float32 here WITHOUT the scale
    would feed the model audio 32767x too large."""
    hop = hop_samples or window_samples
    n = len(waveform)
    num_windows = max(1, -(-max(n - window_samples, 0) // hop) + 1)
    total = (num_windows - 1) * hop + window_samples
    if waveform.dtype != np.int16:
        waveform = waveform.astype(np.float32)
    padded = np.pad(waveform, (0, max(0, total - n)))
    return (
        np.stack([padded[i * hop : i * hop + window_samples] for i in range(num_windows)]),
        num_windows,
    )


def tag_long_audio(
    model,
    waveform: np.ndarray,
    window_samples: int = CLIP_SAMPLES,
    hop_samples: Optional[int] = None,
    batch_size: int = 32,
    reduce: str = "max",
) -> Dict[str, np.ndarray]:
    """Long-audio tagging: window -> batch -> forward -> reduce.

    Returns {'windowwise_output' (W, 527), 'clipwise_output' (527,)}.
    ``reduce``: 'max' | 'mean' over windows. Windows are padded to a full
    batch so one compiled program serves any audio length.
    """
    windows, n = sliding_windows(waveform, window_samples, hop_samples)
    outs: List[np.ndarray] = []
    for start in range(0, len(windows), batch_size):
        chunk = windows[start : start + batch_size]
        if len(chunk) < batch_size:
            chunk = np.pad(chunk, ((0, batch_size - len(chunk)), (0, 0)))
        probs = np.asarray(model.forward(chunk)["clipwise_output"])
        outs.append(probs)
    windowwise = np.concatenate(outs)[:n]
    clipwise = windowwise.max(axis=0) if reduce == "max" else windowwise.mean(axis=0)
    return {"windowwise_output": windowwise, "clipwise_output": clipwise}


def embed_long_audio(
    model,
    waveform: np.ndarray,
    window_samples: int = CLIP_SAMPLES,
    batch_size: int = 32,
) -> Dict[str, np.ndarray]:
    """Long-audio embeddings: window -> batch -> stitch.

    The reference forwards variable-length audio WHOLE through the
    fully-convolutional trunk (extract_embeddings.py:72-83), so its frame
    embeddings' time dim scales with length but every length recompiles.
    Here non-overlapping 10-s windows run through ONE compiled shape and
    the per-window frame embeddings (768, 31, 7) concatenate along the
    time axis -> (768, 31*W, 7); differences vs the whole-clip forward are
    receptive-field edge effects at window boundaries (bounded by the
    windowed-vs-whole tests in test_engine/test_reference_parity).

    Returns {'frame_embeddings' (768, 31*W, 7),
             'windowwise_scene' (W, 768),
             'scene_embedding' (768,) mean over windows}.
    """
    windows, n = sliding_windows(waveform, window_samples)
    frames: List[np.ndarray] = []
    scenes: List[np.ndarray] = []
    for start in range(0, len(windows), batch_size):
        chunk = windows[start : start + batch_size]
        k = len(chunk)
        if k < batch_size:
            chunk = np.pad(chunk, ((0, batch_size - k), (0, 0)))
        frames.append(np.asarray(model.forward_frame_embeddings(chunk))[:k])
        scenes.append(np.asarray(model.forward_scene_embeddings(chunk))[:k])
    fr = np.concatenate(frames)[:n]  # (W, C, T, F)
    windowwise_scene = np.concatenate(scenes)[:n]
    frame_embeddings = np.concatenate(list(fr), axis=1)  # time-axis stitch
    return {
        "frame_embeddings": frame_embeddings,
        "windowwise_scene": windowwise_scene,
        "scene_embedding": windowwise_scene.mean(axis=0),
    }


def extract_embeddings_to_hdf5(
    model,
    wav_paths: Sequence[str],
    out_hdf5: str,
    kind: str = "logits",
    sample_rate: int = SAMPLE_RATE,
) -> int:
    """Walk files, forward each, store per-file vectors into an HDF5
    (extract_embeddings.py:57-99). ``kind``: 'logits' | 'scene'.

    Unlike the reference (which forwards variable-length audio whole and
    recompiles per shape), clips are padded/cropped to 10 s for one compiled
    shape; errors are collected, not swallowed.
    """
    import h5py

    n_ok = 0
    errors: List[Tuple[str, str]] = []
    with h5py.File(out_hdf5, "w") as hf:
        for path in wav_paths:
            try:
                clip = load_clip(path, sample_rate=sample_rate)
                if kind == "scene":
                    vec = np.asarray(model.forward_scene_embeddings(clip))[0]
                else:
                    vec = np.asarray(model.forward(clip)["clipwise_logits"])[0]
                import os

                fid = os.path.splitext(os.path.basename(path))[0]
                hf[fid] = vec
                n_ok += 1
            except Exception as e:  # record, continue (vs bare except :96)
                errors.append((path, repr(e)))
    if errors:
        import logging

        for path, err in errors:
            logging.warning("embedding extraction failed for %s: %s", path, err)
    return n_ok
