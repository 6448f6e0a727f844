"""Dataset build tooling: CSV metadata -> packed waveform + index HDF5.

Equivalents of utils/dataset.py (split_unbalanced_csv_to_partial_csvs:29,
pack_waveforms_to_hdf5:146) and the index-file creation the training/eval
flows expect. The youtube-dl download step is out of scope in an offline
environment; packing starts from on-disk audio files.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import h5py
import numpy as np

from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, NUM_CLASSES, SAMPLE_RATE
from audioset_convnext_inf_tpu.data.audio_io import (
    float32_to_int16,
    pad_or_truncate,
    read_audio,
)
from audioset_convnext_inf_tpu.labels import read_audioset_label_tags


def read_metadata(csv_path: str, audio_dir: str, classes_num: int = NUM_CLASSES,
                  id_to_ix: Optional[dict] = None, audio_ext: str = ".flac") -> Dict[str, np.ndarray]:
    """Parse an AudioSet segment CSV, keeping only rows whose audio exists.

    Mirrors utilities.py:62-124 incl. the file naming convention
    ``{ytid}_{start}_{end}{ext}`` with dots stripped and the ``_0000_`` ->
    ``_0_`` quirk.
    """
    if id_to_ix is None:
        id_to_ix = read_audioset_label_tags().id_to_ix
    with open(csv_path, "r") as fr:
        lines = fr.readlines()[3:]

    audio_names: List[str] = []
    rows: List[List[str]] = []
    for line in lines:
        items = line.split(", ")
        name = "{}_{}_{}{}".format(
            items[0], items[1].replace(".", ""), items[2].replace(".", ""), audio_ext
        ).replace("_0000_", "_0_")
        if os.path.exists(os.path.join(audio_dir, name)):
            audio_names.append(name)
            rows.append(items)

    targets = np.zeros((len(audio_names), classes_num), dtype=bool)
    for n, items in enumerate(rows):
        for label_id in items[3].split('"')[1].split(","):
            targets[n, id_to_ix[label_id]] = 1
    return {"audio_name": np.array(audio_names), "target": targets}


def split_unbalanced_csv_to_partial_csvs(csv_path: str, out_dir: str, rows_per_file: int = 50000) -> List[str]:
    """Split the giant unbalanced CSV into 50k-row parts (dataset.py:29-60)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(csv_path) as f:
        lines = f.readlines()
    head, body = lines[:3], lines[3:]
    paths = []
    for i in range(0, len(body), rows_per_file):
        part = os.path.join(out_dir, f"unbalanced_train_segments_part{i // rows_per_file:02d}.csv")
        with open(part, "w") as f:
            f.writelines(head + body[i : i + rows_per_file])
        paths.append(part)
    return paths


def pack_waveforms_to_hdf5(
    csv_path: str,
    audios_dir: str,
    waveforms_hdf5_path: str,
    sample_rate: int = SAMPLE_RATE,
    clip_samples: int = CLIP_SAMPLES,
    mini_data: int = 0,
    audio_ext: str = ".wav",
) -> str:
    """Pack audio files into the reference HDF5 schema (dataset.py:146-237)."""
    meta = read_metadata(csv_path, audios_dir, audio_ext=audio_ext)
    audio_names, targets = meta["audio_name"], meta["target"]
    if mini_data:
        audio_names, targets = audio_names[:mini_data], targets[:mini_data]

    os.makedirs(os.path.dirname(os.path.abspath(waveforms_hdf5_path)), exist_ok=True)
    n = len(audio_names)
    # stored audio_name strips the "_<start>_<end>.<ext>" segment suffix to
    # the bare YouTube id, S20 - the reference schema (dataset.py:194,232:
    # re.sub(r'_\d+_\d+.flac$', '', name) into an S20 dataset), which
    # samplers/blacklists and eval exports key on
    strip = re.compile(r"_\d+_\d+" + re.escape(audio_ext) + "$")
    with h5py.File(waveforms_hdf5_path, "w") as hf:
        hf.create_dataset("audio_name", shape=(n,), dtype="S20")
        hf.create_dataset("waveform", shape=(n, clip_samples), dtype=np.int16)
        hf.create_dataset("target", shape=(n, targets.shape[1]), dtype=bool)
        hf.attrs.create("sample_rate", data=sample_rate, dtype=np.int32)
        for i, name in enumerate(audio_names):
            audio, _ = read_audio(os.path.join(audios_dir, name), target_sr=sample_rate)
            audio = pad_or_truncate(audio, clip_samples)
            hf["audio_name"][i] = strip.sub("", name).encode()
            hf["waveform"][i] = float32_to_int16(audio)
            hf["target"][i] = targets[i]
    return waveforms_hdf5_path


def download_wavs(
    csv_path: str,
    audios_dir: str,
    mini_data: int = 0,
    downloader: str = "yt-dlp",
    ffmpeg: str = "ffmpeg",
    dry_run: bool = False,
) -> List[str]:
    """Download AudioSet clips listed in a segments CSV (dataset.py:63-143).

    Builds per-clip command triples: full-audio fetch, ffmpeg trim to the
    CSV's [start, end] segment at 32 kHz mono, then removal of the raw
    download (the reference rm's it at dataset.py:133 - keeping it would
    need orders of magnitude more disk than the trimmed clips). With
    ``dry_run=True`` (or when the binaries are missing) the commands are
    returned without executing - this environment has no network egress, so
    command construction is the testable surface.
    """
    import shutil
    import subprocess

    os.makedirs(audios_dir, exist_ok=True)
    with open(csv_path, "r") as fr:
        lines = fr.readlines()[3:]
    if mini_data:
        lines = lines[:mini_data]

    have_tools = shutil.which(downloader) and shutil.which(ffmpeg)
    commands: List[str] = []
    for line in lines:
        items = line.split(", ")
        ytid, start = items[0], float(items[1])
        duration = float(items[2]) - start  # reference trims end-start seconds
        out_name = "{}_{}_{}".format(
            ytid, items[1].replace(".", ""), items[2].replace(".", "")
        ).replace("_0000_", "_0_")
        raw = os.path.join(audios_dir, f"_{ytid}.raw_audio")
        final = os.path.join(audios_dir, out_name + ".wav")
        dl = f'{downloader} -x -o "{raw}.%(ext)s" "https://www.youtube.com/watch?v={ytid}"'
        trim = (
            f'{ffmpeg} -y -i "{raw}".* -ac 1 -ar 32000 -ss {start} '
            f'-t {duration} "{final}"'
        )
        cleanup = f'rm -f "{raw}".*'
        commands.extend([dl, trim, cleanup])
        if not dry_run and have_tools and not os.path.exists(final):
            subprocess.run(dl, shell=True, check=False)
            subprocess.run(trim, shell=True, check=False)
            subprocess.run(cleanup, shell=True, check=False)
    if not have_tools and not dry_run:
        import logging

        logging.warning(
            "yt-dlp/ffmpeg not found; returning %d commands without executing",
            len(commands),
        )
    return commands


def create_indexes(waveforms_hdf5_path: str, indexes_hdf5_path: str) -> str:
    """Build the index HDF5 the samplers consume from a packed-waveform file."""
    with h5py.File(waveforms_hdf5_path, "r") as hr:
        n = len(hr["audio_name"])
        with h5py.File(indexes_hdf5_path, "w") as hw:
            hw.create_dataset("audio_name", data=hr["audio_name"][:])
            hw.create_dataset("target", data=hr["target"][:])
            hw.create_dataset(
                "hdf5_path",
                data=[os.path.abspath(waveforms_hdf5_path).encode()] * n,
            )
            hw.create_dataset("index_in_hdf5", data=np.arange(n, dtype=np.int32))
    return indexes_hdf5_path


def combine_indexes(index_paths: List[str], out_path: str) -> str:
    """Concatenate several index HDF5s (full-train = many packed parts)."""
    names, targets, paths, idxs = [], [], [], []
    for p in index_paths:
        with h5py.File(p, "r") as hf:
            names.append(hf["audio_name"][:])
            targets.append(hf["target"][:])
            paths.append(hf["hdf5_path"][:])
            idxs.append(hf["index_in_hdf5"][:])
    with h5py.File(out_path, "w") as hw:
        hw.create_dataset("audio_name", data=np.concatenate(names))
        hw.create_dataset("target", data=np.concatenate(targets))
        hw.create_dataset("hdf5_path", data=np.concatenate(paths))
        hw.create_dataset("index_in_hdf5", data=np.concatenate(idxs))
    return out_path
