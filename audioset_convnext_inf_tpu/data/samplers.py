"""Batch-meta samplers with resumable state.

Behavioral ports of utils/data_generator.py:126-501:

 - :class:`TrainSampler` - infinite uniform-shuffle sampler
 - :class:`BalancedTrainSampler` - class-queue round-robin with per-class
   pointers (equal sampling across the 527 classes)
 - :class:`AlternateTrainSampler` - alternates the two per batch
 - :class:`EvaluateSampler` - finite sequential batches with targets

All train samplers support ``state_dict`` / ``load_state_dict`` so training
resume reproduces the exact data order (reference main.py:714-717), and
honor a blacklist CSV of audio-name prefixes (data_generator.py:17-24,209).
"""

from __future__ import annotations

import csv
from typing import Iterator, List, Optional

import numpy as np

from audioset_convnext_inf_tpu.data.hdf5_dataset import load_index


def read_black_list(black_list_csv: str) -> List[str]:
    with open(black_list_csv, "r") as fr:
        return [line[0] for line in csv.reader(fr)]


def _rng_state(rs: np.random.RandomState) -> dict:
    """MT19937 state as a plain dict (checkpoint-serializer friendly)."""
    name, keys, pos, has_gauss, cached = rs.get_state()
    return {"name": name, "keys": np.asarray(keys).copy(), "pos": int(pos),
            "has_gauss": int(has_gauss), "cached_gaussian": float(cached)}


def _restore_rng(rs: np.random.RandomState, state: Optional[dict]) -> None:
    if state is None:  # pre-round-3 checkpoints carry no RNG; keep the seed
        return
    rs.set_state((str(state["name"]), np.asarray(state["keys"], np.uint32),
                  int(state["pos"]), int(state["has_gauss"]),
                  float(state["cached_gaussian"])))


class _Base:
    def __init__(
        self,
        indexes_hdf5_path: str,
        batch_size: int,
        black_list_csv: Optional[str] = None,
        random_seed: int = 1234,
    ):
        self.batch_size = batch_size
        self.random_state = np.random.RandomState(random_seed)
        self.black_list_names = set(read_black_list(black_list_csv)) if black_list_csv else set()
        idx = load_index(indexes_hdf5_path)
        self.audio_names = idx["audio_names"]
        self.hdf5_paths = idx["hdf5_paths"]
        self.indexes_in_hdf5 = idx["indexes_in_hdf5"]
        self.targets = idx["targets"]
        self.audios_num, self.classes_num = self.targets.shape

    def _blacklisted(self, index: int) -> bool:
        # The blacklist holds bare 11-char YouTube ids (blacklist.py, as the
        # reference's create_black_list.py emits). Extract the id from
        # whatever audio-name convention the index file uses: PANN-style
        # "Y<ytid>.wav" (16 chars), bare "<ytid>" (reference pack, S20
        # motif-stripped), or this repo's "<ytid>_<start>_<end>.<ext>" -
        # the reference's own `audio_name[:-9]` comparison
        # (data_generator.py:209) silently matches none of these; matching
        # the id is the behavior the blacklist exists for.
        name = self.audio_names[index]
        if len(name) == 16 and name[0] == "Y" and name.endswith(".wav"):
            ytid = name[1:12]
        else:
            ytid = name[:11]
        return ytid in self.black_list_names

    def _meta(self, index: int) -> dict:
        return {
            "hdf5_path": self.hdf5_paths[index],
            "index_in_hdf5": int(self.indexes_in_hdf5[index]),
        }


class TrainSampler(_Base):
    """Infinite uniform sampler (data_generator.py:163-228)."""

    def __init__(self, indexes_hdf5_path, batch_size, black_list_csv=None, random_seed=1234):
        super().__init__(indexes_hdf5_path, batch_size, black_list_csv, random_seed)
        # epoch permutations are REPLACED, never mutated in place
        # (np.random.permutation = shuffle on a copy, identical RNG stream),
        # so state_dict can share the array with snapshots copy-free
        self.indexes = self.random_state.permutation(self.audios_num)
        self.pointer = 0

    def _next_index(self) -> int:
        index = self.indexes[self.pointer]
        self.pointer += 1
        if self.pointer >= self.audios_num:
            self.pointer = 0
            self.indexes = self.random_state.permutation(self.indexes)
        return index

    def __iter__(self) -> Iterator[List[dict]]:
        while True:
            batch_meta = []
            while len(batch_meta) < self.batch_size:
                index = self._next_index()
                if self._blacklisted(index):
                    continue
                batch_meta.append(self._meta(index))
            yield batch_meta

    def state_dict(self) -> dict:
        # the permutation array is shared, not copied: epoch wraps REPLACE
        # self.indexes (never mutate it), so a captured snapshot stays
        # valid - state_dict is called per batch by the prefetching loader
        # and a full-AudioSet copy here would cost ~16 MB/batch. The RNG
        # state makes resume exact across the epoch-wrap reshuffle - the
        # reference omits it (data_generator.py:216-228) and silently
        # reshuffles differently after resume.
        return {"indexes": self.indexes, "pointer": self.pointer,
                "rng": _rng_state(self.random_state)}

    def load_state_dict(self, state: dict) -> None:
        self.indexes = np.asarray(state["indexes"]).copy()
        self.pointer = state["pointer"]
        _restore_rng(self.random_state, state.get("rng"))


class BalancedTrainSampler(_Base):
    """Class-balanced sampler (data_generator.py:231-331)."""

    def __init__(self, indexes_hdf5_path, batch_size, black_list_csv=None, random_seed=1234):
        super().__init__(indexes_hdf5_path, batch_size, black_list_csv, random_seed)
        self.samples_num_per_class = np.sum(self.targets, axis=0)
        # per-class permutations are REPLACED on wrap, never mutated in
        # place (permutation = shuffle on a copy, identical RNG stream), so
        # state_dict can share them with snapshots copy-free
        self.indexes_per_class = [
            self.random_state.permutation(np.where(self.targets[:, k] == 1)[0])
            for k in range(self.classes_num)
        ]
        self.queue: List[int] = []
        self.pointers_of_classes = [0] * self.classes_num

    def _expand_queue(self) -> None:
        classes_set = np.arange(self.classes_num).tolist()
        self.random_state.shuffle(classes_set)
        self.queue += classes_set

    def _next_index(self) -> int:
        # skip classes with no positive samples (the reference would crash
        # here; real AudioSet index sets populate every class)
        while True:
            if not self.queue:
                self._expand_queue()
            class_id = self.queue.pop(0)
            if self.samples_num_per_class[class_id] > 0:
                break
        pointer = self.pointers_of_classes[class_id]
        self.pointers_of_classes[class_id] += 1
        index = self.indexes_per_class[class_id][pointer]
        if self.pointers_of_classes[class_id] >= self.samples_num_per_class[class_id]:
            self.pointers_of_classes[class_id] = 0
            self.indexes_per_class[class_id] = self.random_state.permutation(
                self.indexes_per_class[class_id])
        return index

    def __iter__(self) -> Iterator[List[dict]]:
        while True:
            batch_meta = []
            while len(batch_meta) < self.batch_size:
                index = self._next_index()
                if self._blacklisted(index):
                    continue
                batch_meta.append(self._meta(index))
            yield batch_meta

    def state_dict(self) -> dict:
        # per-class arrays are shared (wraps replace them, never mutate -
        # copying all 527 on full AudioSet is ~40 MB, and the prefetching
        # loader calls this once per batch); the list itself and the small
        # queue/pointer lists are copied. Includes the RNG state (queue
        # refills + per-class reshuffles draw from it) so resume reproduces
        # the exact batch stream; the reference omits it
        # (data_generator.py:317-331)
        return {
            "indexes_per_class": list(self.indexes_per_class),
            "queue": list(self.queue),
            "pointers_of_classes": list(self.pointers_of_classes),
            "rng": _rng_state(self.random_state),
        }

    def load_state_dict(self, state: dict) -> None:
        self.indexes_per_class = [np.asarray(a).copy() for a in state["indexes_per_class"]]
        self.queue = list(state["queue"])
        self.pointers_of_classes = list(state["pointers_of_classes"])
        _restore_rng(self.random_state, state.get("rng"))


class AlternateTrainSampler:
    """Alternates uniform and balanced batches (data_generator.py:334-448)."""

    def __init__(self, indexes_hdf5_path, batch_size, black_list_csv=None, random_seed=1234):
        self.sampler1 = TrainSampler(indexes_hdf5_path, batch_size, black_list_csv, random_seed)
        self.sampler2 = BalancedTrainSampler(indexes_hdf5_path, batch_size, black_list_csv, random_seed)
        self.batch_size = batch_size
        self.count = 0

    def __iter__(self) -> Iterator[List[dict]]:
        while True:
            self.count += 1
            sampler = self.sampler1 if self.count % 2 == 0 else self.sampler2
            batch_meta = []
            while len(batch_meta) < self.batch_size:
                index = sampler._next_index()
                if sampler._blacklisted(index):
                    continue
                batch_meta.append(sampler._meta(index))
            yield batch_meta

    def state_dict(self) -> dict:
        return {
            "sampler1": self.sampler1.state_dict(),
            "sampler2": self.sampler2.state_dict(),
            "count": self.count,
        }

    def load_state_dict(self, state: dict) -> None:
        self.sampler1.load_state_dict(state["sampler1"])
        self.sampler2.load_state_dict(state["sampler2"])
        self.count = state.get("count", 0)


class EvaluateSampler:
    """Finite sequential sampler with targets (data_generator.py:451-501)."""

    def __init__(self, indexes_hdf5_path: str, batch_size: int):
        self.batch_size = batch_size
        idx = load_index(indexes_hdf5_path)
        self.audio_names = idx["audio_names"]
        self.hdf5_paths = idx["hdf5_paths"]
        self.indexes_in_hdf5 = idx["indexes_in_hdf5"]
        self.targets = idx["targets"]
        self.audios_num = len(self.audio_names)

    def __iter__(self) -> Iterator[List[dict]]:
        for start in range(0, self.audios_num, self.batch_size):
            end = min(start + self.batch_size, self.audios_num)
            yield [
                {
                    "audio_name": self.audio_names[i],
                    "hdf5_path": self.hdf5_paths[i],
                    "index_in_hdf5": int(self.indexes_in_hdf5[i]),
                    "target": self.targets[i],
                }
                for i in range(start, end)
            ]
