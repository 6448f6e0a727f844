"""Synthetic AudioSet-format HDF5 fixtures for tests and benchmarks."""

from __future__ import annotations

import os

import h5py
import numpy as np


def make_packed_and_index(
    directory: str,
    n_clips: int = 32,
    clip_samples: int = 32000,
    n_classes: int = 527,
    seed: int = 0,
    name: str = "synth",
):
    """Create a packed-waveform HDF5 + matching index HDF5; returns paths."""
    rng = np.random.RandomState(seed)
    os.makedirs(directory, exist_ok=True)
    packed = os.path.join(directory, f"{name}_waveforms.h5")
    index = os.path.join(directory, f"{name}_indexes.h5")

    names = np.array([f"Y{i:07d}xxx_100_200".encode() for i in range(n_clips)])
    waveforms = (rng.randn(n_clips, clip_samples) * 3000).astype(np.int16)
    targets = np.zeros((n_clips, n_classes), dtype=bool)
    for i in range(n_clips):
        # ensure every clip has 1-3 labels and early classes are populated
        targets[i, i % 8] = True
        for k in rng.randint(0, n_classes, rng.randint(0, 3)):
            targets[i, k] = True

    with h5py.File(packed, "w") as hf:
        hf.create_dataset("audio_name", data=names)
        hf.create_dataset("waveform", data=waveforms)
        hf.create_dataset("target", data=targets)
        hf.attrs.create("sample_rate", data=32000, dtype=np.int32)

    with h5py.File(index, "w") as hf:
        hf.create_dataset("audio_name", data=names)
        hf.create_dataset("target", data=targets)
        hf.create_dataset("hdf5_path", data=[packed.encode()] * n_clips)
        hf.create_dataset("index_in_hdf5", data=np.arange(n_clips, dtype=np.int32))

    return packed, index
