"""AudioSet HDF5 datasets (packed-waveform + index files).

Same on-disk schema as the reference (utils/dataset.py:193-199):

 - packed waveform HDF5: datasets ``audio_name`` (S20), ``waveform``
   (int16, (N, clip_samples)), ``target`` (bool, (N, 527)), attr
   ``sample_rate``.
 - index HDF5: ``audio_name``, ``hdf5_path``, ``index_in_hdf5``, ``target``
   - the working set samplers iterate over.

:class:`AudioSetDataset` mirrors utils/data_generator.py:27-123: meta
{'hdf5_path', 'index_in_hdf5'} -> {'audio_name', 'waveform' float32,
'target' float32}. File handles are cached per (path, thread) because the
prefetching loader reads from a thread pool rather than worker processes.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional

import h5py
import numpy as np

from audioset_convnext_inf_tpu.data.audio_io import decimate_resample, int16_to_float32


class AudioSetDataset:
    def __init__(self, sample_rate: int = 32000, training: bool = False,
                 use_kaldi_fbank: bool = False, keep_int16: bool = False):
        """``use_kaldi_fbank`` is the analog of the reference's
        use_torchaudio mode (data_generator.py:75-97): items carry a
        host-computed (T, 224) Kaldi fbank instead of the raw waveform.

        ``keep_int16`` ships the packed int16 samples unscaled; the device
        decodes (x * config.INT16_SCALE, bit-identical to the host decode)
        inside the jitted forward - halves host->device bandwidth on both
        the eval and train hot paths (the train step decodes too,
        engine/trainer.py). Only honored for plain 32 kHz waveforms: the
        decimation and Kaldi-fbank paths consume host-side float32 and
        would silently run on 32767x-scaled samples otherwise.
        """
        self.sample_rate = sample_rate
        self.training = training
        self.use_kaldi_fbank = use_kaldi_fbank
        self.keep_int16 = (
            keep_int16 and sample_rate == 32000 and not use_kaldi_fbank
        )
        self._local = threading.local()

    def _file(self, path: str) -> h5py.File:
        cache: Dict[str, h5py.File] = getattr(self._local, "files", None) or {}
        if not hasattr(self._local, "files"):
            self._local.files = cache
        f = cache.get(path)
        if f is None:
            f = h5py.File(path, "r")
            cache[path] = f
        return f

    def __getitem__(self, meta: dict) -> dict:
        hf = self._file(meta["hdf5_path"])
        idx = meta["index_in_hdf5"]
        audio_name = hf["audio_name"][idx].decode()
        if self.keep_int16:
            waveform = hf["waveform"][idx]  # raw int16, device decodes
        else:
            waveform = int16_to_float32(hf["waveform"][idx])
            waveform = decimate_resample(waveform, self.sample_rate)
        target = hf["target"][idx].astype(np.float32)
        if self.use_kaldi_fbank:
            from audioset_convnext_inf_tpu.ops.kaldi_fbank import kaldi_fbank

            fbank = kaldi_fbank(waveform, sample_rate=self.sample_rate)
            return {"audio_name": audio_name, "fbank": fbank, "target": target}
        return {"audio_name": audio_name, "waveform": waveform, "target": target}

    def close(self):
        for f in getattr(self._local, "files", {}).values():
            f.close()


def load_index(indexes_hdf5_path: str) -> dict:
    """Load an index HDF5 into numpy arrays (data_generator.py:150-156)."""
    with h5py.File(indexes_hdf5_path, "r") as hf:
        return {
            "audio_names": np.array([n.decode() for n in hf["audio_name"][:]]),
            "hdf5_paths": np.array([p.decode() for p in hf["hdf5_path"][:]]),
            "indexes_in_hdf5": hf["index_in_hdf5"][:],
            "targets": hf["target"][:].astype(np.float32),
        }


def collate(list_data_dict: list) -> dict:
    """Stack a list of per-clip dicts into batched numpy arrays.

    Unlike the reference's object-array collate (data_generator.py:504-526),
    numeric fields become dense float32 arrays ready for device_put.
    """
    out: dict = {}
    for key in list_data_dict[0]:
        vals = [d[key] for d in list_data_dict]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = np.array(vals)
    return out
