"""Data pipeline tests: dataset, samplers (+resume), loader, packing."""

import os

import numpy as np
import pytest

from audioset_convnext_inf_tpu.data import (
    AudioSetDataset,
    AlternateTrainSampler,
    BalancedTrainSampler,
    DataLoader,
    EvaluateSampler,
    TrainSampler,
    create_indexes,
    int16_to_float32,
    pack_waveforms_to_hdf5,
)
from tests.make_synth_hdf5 import make_packed_and_index


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_h5")
    return make_packed_and_index(str(d), n_clips=32, clip_samples=16000)


def test_dataset_getitem(synth):
    packed, index = synth
    ds = AudioSetDataset()
    item = ds[{"hdf5_path": packed, "index_in_hdf5": 3}]
    assert item["waveform"].dtype == np.float32
    assert item["waveform"].shape == (16000,)
    assert item["target"].shape == (527,)
    assert abs(item["waveform"]).max() <= 1.0


def test_train_sampler_infinite_and_resumable(synth):
    _, index = synth
    s1 = TrainSampler(index, batch_size=8, random_seed=7)
    it1 = iter(s1)
    first = [next(it1) for _ in range(3)]
    state = s1.state_dict()

    # a fresh same-seed sampler restored from state continues the stream
    # (resume semantics: sampler rebuilt with identical args, then
    # load_state_dict; since round 3 the state includes the MT19937 state,
    # so the continuation is exact even across epoch-wrap reshuffles)
    s2 = TrainSampler(index, batch_size=8, random_seed=7)
    s2.load_state_dict(state)
    a = [next(iter(s1)) for _ in range(2)]
    b = [next(iter(s2)) for _ in range(2)]
    assert [[m["index_in_hdf5"] for m in batch] for batch in a] == [
        [m["index_in_hdf5"] for m in batch] for batch in b
    ]


def test_balanced_sampler_covers_classes(synth):
    _, index = synth
    s = BalancedTrainSampler(index, batch_size=8, random_seed=3)
    batches = []
    it = iter(s)
    for _ in range(8):
        batches.extend(next(it))
    # class-balanced: the 8 populated base classes each get sampled
    idxs = {m["index_in_hdf5"] for m in batches}
    assert len(idxs) >= 8


def test_alternate_sampler_state_roundtrip(synth):
    _, index = synth
    s = AlternateTrainSampler(index, batch_size=4, random_seed=5)
    it = iter(s)
    for _ in range(3):
        next(it)
    state = s.state_dict()
    s2 = AlternateTrainSampler(index, batch_size=4, random_seed=5)
    s2.load_state_dict(state)
    n1 = [[m["index_in_hdf5"] for m in next(iter(s))] for _ in range(2)]
    n2 = [[m["index_in_hdf5"] for m in next(iter(s2))] for _ in range(2)]
    assert n1 == n2


def test_evaluate_sampler_finite_with_targets(synth):
    _, index = synth
    s = EvaluateSampler(index, batch_size=10)
    batches = list(iter(s))
    assert sum(len(b) for b in batches) == 32
    assert len(batches) == 4  # 10+10+10+2
    assert "target" in batches[0][0]


def test_loader_prefetches_and_pads(synth):
    _, index = synth
    ds = AudioSetDataset()
    loader = DataLoader(ds, EvaluateSampler(index, batch_size=10), num_workers=4,
                        pad_to_batch_size=10)
    batches = list(loader)
    assert len(batches) == 4
    assert all(b["waveform"].shape == (10, 16000) for b in batches)
    assert batches[-1]["valid"] == 2
    # padded rows are zero
    assert np.all(batches[-1]["waveform"][2:] == 0)


def test_loader_order_matches_sampler(synth):
    packed, index = synth
    ds = AudioSetDataset()
    loader = DataLoader(ds, EvaluateSampler(index, batch_size=8), num_workers=4)
    names = np.concatenate([b["audio_name"][: b["valid"]] for b in loader])
    import h5py

    with h5py.File(index, "r") as hf:
        expected = [n.decode() for n in hf["audio_name"][:]]
    assert list(names) == expected


def test_loader_ships_consumed_sampler_snapshots(synth):
    """The prefetching loader runs the sampler ahead of the consumer; each
    yielded batch must carry the sampler state AS OF ITS OWN DRAW, so a
    checkpoint after consuming batch i resumes with batch i+1 (the
    exact-resume contract the round-3 CLI test exercises end-to-end)."""
    _, index = synth
    ds = AudioSetDataset()
    sampler = BalancedTrainSampler(index, batch_size=8, random_seed=11)
    loader = DataLoader(ds, sampler, num_workers=4)
    it = iter(loader)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        assert "sampler_state" in b

    # restoring from batch i's snapshot must regenerate batch i+1 exactly
    for i in range(3):
        fresh = BalancedTrainSampler(index, batch_size=8, random_seed=11)
        fresh.load_state_dict(batches[i]["sampler_state"])
        regenerated = next(iter(fresh))
        want = list(batches[i + 1]["audio_name"])
        got = [ds[m]["audio_name"] for m in regenerated]
        assert got == want, i


def test_pack_roundtrip(tmp_path):
    # build a tiny csv + wav dir, pack, index, read back
    from scipy.io import wavfile

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    csv_lines = ["# head\n", "# head\n", "# head\n"]
    for i in range(3):
        name = f"testclip{i}_0_10000.wav"
        wavfile.write(str(audio_dir / name), 32000, (rng.randn(32000) * 3000).astype(np.int16))
        csv_lines.append(f'testclip{i}, 0.000, 10.000, "/m/09x0r"\n')
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text("".join(csv_lines))

    packed = pack_waveforms_to_hdf5(
        str(csv_path), str(audio_dir), str(tmp_path / "packed.h5"),
        clip_samples=32000, audio_ext=".wav",
    )
    index = create_indexes(packed, str(tmp_path / "index.h5"))

    ds = AudioSetDataset()
    item = ds[{"hdf5_path": packed, "index_in_hdf5": 0}]
    assert item["target"][0] == 1.0  # /m/09x0r = Speech = class 0
    assert item["waveform"].shape == (32000,)

    s = EvaluateSampler(index, batch_size=2)
    assert sum(len(b) for b in iter(s)) == 3


def test_pack_stores_bare_youtube_id(tmp_path):
    """Packed audio_name is the reference schema: segment suffix stripped
    to the bare id, S20 (reference dataset.py:194,232)."""
    from scipy.io import wavfile
    import h5py

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    wavfile.write(str(audio_dir / "testclip0_0_10000.wav"), 32000,
                  (np.random.RandomState(0).randn(32000) * 3000).astype(np.int16))
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text('# h\n# h\n# h\ntestclip0, 0.000, 10.000, "/m/09x0r"\n')
    packed = pack_waveforms_to_hdf5(
        str(csv_path), str(audio_dir), str(tmp_path / "packed.h5"),
        clip_samples=32000, audio_ext=".wav")
    with h5py.File(packed, "r") as hf:
        assert hf["audio_name"].dtype.str == "|S20"
        assert hf["audio_name"][0] == b"testclip0"


def test_blacklist_chain_excludes_ids(tmp_path):
    """End-to-end contamination guard: DCASE segment CSV -> blacklist CLI ->
    sampler skips every clip of the blacklisted YouTube ids (the chain the
    reference create_black_list.py + data_generator.py:209 advertises)."""
    from audioset_convnext_inf_tpu.cli.pack_dataset import main as pack_main

    _, index = make_packed_and_index(str(tmp_path), n_clips=16,
                                     clip_samples=8000)
    # synthetic audio names are "Y0000003xxx_100_200": bare id = first 11
    dcase = tmp_path / "testing_set.csv"
    dcase.write_text(
        "Y0000003xxx_60.000_70.000.wav\t2.3\t4.5\tTrain horn\n"
        "Y0000007xxx_10.000_20.000.wav,0.0,3.1,Air horn\n"
        "Y0000003xxx_60.000_70.000.wav\t5.0\t6.0\tTrain horn\n"  # dup id
    )
    blk = tmp_path / "black_list.csv"
    assert pack_main(["blacklist", "--csvs", str(dcase), "--out", str(blk)]) == 0
    with open(blk) as f:
        assert sorted(line.strip() for line in f if line.strip()) == [
            "Y0000003xxx", "Y0000007xxx"]

    banned = {3, 7}
    for cls in (TrainSampler, BalancedTrainSampler, AlternateTrainSampler):
        sampler = cls(index, batch_size=8, black_list_csv=str(blk))
        it = iter(sampler)
        drawn = {m["index_in_hdf5"] for _ in range(30) for m in next(it)}
        assert not (drawn & banned), cls.__name__
        assert len(drawn) == 14, cls.__name__  # everything else still drawn


def test_sampler_snapshots_are_copy_free_and_wrap_safe(tmp_path):
    """state_dict shares permutation arrays (called per batch by the
    prefetching loader; copying is ~16-40 MB/batch on full AudioSet), and
    epoch wraps REPLACE the arrays so captured snapshots stay valid."""
    _, index = make_packed_and_index(str(tmp_path), n_clips=16,
                                     clip_samples=8000)
    s = TrainSampler(index, batch_size=8, random_seed=7)
    snap = s.state_dict()
    assert snap["indexes"] is s.indexes  # shared, not copied
    frozen = snap["indexes"].copy()
    it = iter(s)
    for _ in range(10):  # run past several epoch wraps (16 clips)
        next(it)
    np.testing.assert_array_equal(snap["indexes"], frozen)  # not mutated

    # restoring the pre-wrap snapshot reproduces the exact stream
    s2 = TrainSampler(index, batch_size=8, random_seed=99)
    s2.load_state_dict(snap)
    s3 = TrainSampler(index, batch_size=8, random_seed=7)
    a = [m["index_in_hdf5"] for b in zip(range(6), iter(s2)) for m in b[1]]
    b = [m["index_in_hdf5"] for n in zip(range(6), iter(s3)) for m in n[1]]
    assert a == b

    bal = BalancedTrainSampler(index, batch_size=8, random_seed=7)
    snap = bal.state_dict()
    assert snap["indexes_per_class"][0] is bal.indexes_per_class[0]
    frozen0 = snap["indexes_per_class"][0].copy()
    it = iter(bal)
    for _ in range(20):  # tiny classes wrap many times
        next(it)
    np.testing.assert_array_equal(snap["indexes_per_class"][0], frozen0)
