"""AudioCaps dataset + transfer finetune tests (synthetic fixtures)."""

import os

import numpy as np
import pytest

from audioset_convnext_inf_tpu.data.audiocaps import AudioCaps, BasicCollate, tag_2_onehot


@pytest.fixture(scope="module")
def audiocaps_root(tmp_path_factory):
    # the real on-disk layout prepare_audiocaps_subset builds (and the
    # reference reads): audio/<subset>/{youtube_id}_{start_seconds}.flac
    from tests.flac_encoder import encode_flac

    root = tmp_path_factory.mktemp("ac_root")
    data = root / "AUDIOCAPS_32000Hz"
    rng = np.random.RandomState(0)
    for subset, caps_per in (("train", 1), ("val", 5)):
        audio_dir = data / "audio" / subset
        audio_dir.mkdir(parents=True)
        lines = ["audiocap_id,youtube_id,start_time,caption\n"]
        for i in range(4):
            ytid = f"yt{subset}{i:04d}"
            start = 10
            for c in range(caps_per):
                lines.append(f"{i * 10 + c},{ytid},{start},a caption number {c}\n")
            # variable lengths to exercise pad-to-longest collate
            n = 16000 + 1000 * i
            (audio_dir / f"{ytid}_{start}.flac").write_bytes(
                encode_flac((rng.randn(n) * 2000).astype(np.int64), 32000))
        # a 5th clip listed in the CSV but NOT on disk (the reference's
        # exclude_removed_audio case: ~7% of AudioCaps is undownloadable)
        lines.extend(f"{90 + c},ytmissing00,10,a caption number {c}\n"
                     for c in range(caps_per))
        (data / f"{subset}.csv").write_text("".join(lines))
        tag_lines = ["youtube_id,mids\n"] + [
            f"yt{subset}{i:04d},/m/09x0r;/m/05zppz\n" for i in range(4)
        ]
        (data / f"{subset}_tags.csv").write_text("".join(tag_lines))
    return str(root)


def test_audiocaps_loads_and_groups_captions(audiocaps_root):
    train = AudioCaps(root=audiocaps_root, subset="train", with_tags=True)
    val = AudioCaps(root=audiocaps_root, subset="val", with_tags=True)
    # the CSV lists 5 clips but one is not on disk; the default
    # exclude_removed_audio=True drops it (reference audiocaps.py:396-408)
    assert len(train) == 4 and len(val) == 4
    assert len(val.at(0, "captions")) == 5
    assert train.at(0, "tags") == [0, 1]  # Speech, Male speech
    item = train[0]
    assert item["audio"].ndim == 1 and len(item["audio"]) == 16000
    assert item["tags"] == [0, 1]


def test_audiocaps_exclude_removed_audio_off_keeps_missing(audiocaps_root):
    ds = AudioCaps(root=audiocaps_root, subset="train", with_tags=True,
                   exclude_removed_audio=False)
    assert len(ds) == 5
    assert ds.at(4, "youtube_id") == "ytmissing00"
    assert ds.at(4, "is_on_disk") is False
    with pytest.raises(FileNotFoundError):
        ds.at(4, "audio")


def test_audiocaps_columnar_access(audiocaps_root):
    ds = AudioCaps(root=audiocaps_root, subset="train", with_tags=True)
    assert ds.at(1, "youtube_id") == "yttrain0001"
    assert "captions" in ds.column_names and "audio" in ds.column_names
    assert ds.shape[0] == 4
    assert len(ds.index_to_tagname) == 527


def test_audiocaps_flat_captions(audiocaps_root):
    ds = AudioCaps(root=audiocaps_root, subset="val", with_tags=True, flat_captions=True)
    assert len(ds) == 20  # 4 clips x 5 captions
    assert len(ds.at(0, "captions")) == 1


def test_audiocaps_download_raises(audiocaps_root):
    with pytest.raises(RuntimeError):
        AudioCaps(root=audiocaps_root, subset="train", download=True)


def test_basic_collate_pads_and_onehots(audiocaps_root):
    ds = AudioCaps(root=audiocaps_root, subset="train", with_tags=True)
    collate = BasicCollate(with_tags=True)
    batch = collate([ds[i] for i in range(4)])
    assert batch["audio"].shape == (4, 19000)  # padded to longest
    assert batch["tags"].shape == (4, 527)
    np.testing.assert_array_equal(batch["tags"][:, 0], 1.0)
    oh = tag_2_onehot([3, 5])
    assert oh.shape == (1, 527) and oh[0, 3] == 1 and oh.sum() == 2


def test_transfer_trainer_freezes_base(audiocaps_root):
    import jax

    from audioset_convnext_inf_tpu.engine.transfer import TransferTrainer
    from audioset_convnext_inf_tpu.models.pann import create_pann_model

    # small stand-in trunk keeps the test fast; same structure keys
    model = create_pann_model("Cnn6")
    before_conv = np.asarray(model.params["conv_block1"]["conv1"]["w"]).copy()
    before_fc = np.asarray(model.params["fc_audioset"]["w"]).copy()
    before_bn_scale = np.asarray(model.params["bn0"]["scale"]).copy()
    before_bn_mean = np.asarray(model.params["bn0"]["mean"]).copy()

    trainer = TransferTrainer(model, learning_rate=1e-3)
    rng = np.random.RandomState(0)
    audio = (rng.randn(2, 16000) * 0.1).astype(np.float32)
    tags = np.zeros((2, 527), np.float32)
    tags[:, 0] = 1
    l0 = trainer.step(audio, tags)
    l1 = trainer.step(audio, tags)
    assert np.isfinite([l0, l1]).all()

    np.testing.assert_array_equal(
        np.asarray(model.params["conv_block1"]["conv1"]["w"]), before_conv
    )  # base frozen
    assert not np.allclose(np.asarray(model.params["fc_audioset"]["w"]), before_fc)
    # BN running stats adapt (reference keeps the frozen base in train mode,
    # finetune_audiocaps.py:186, so buffers keep updating) while the BN
    # affine weights stay frozen.
    np.testing.assert_array_equal(np.asarray(model.params["bn0"]["scale"]), before_bn_scale)
    assert not np.array_equal(np.asarray(model.params["bn0"]["mean"]), before_bn_mean)


def test_transfer_trainer_fit_epochs_and_history(audiocaps_root):
    """fit() mirrors the reference loop (finetune_audiocaps.py:166-226):
    per-epoch train pass, val/test mAP, optional checkpoint hook."""
    from audioset_convnext_inf_tpu.engine.transfer import TransferTrainer
    from audioset_convnext_inf_tpu.models.pann import create_pann_model

    model = create_pann_model("Cnn6")
    trainer = TransferTrainer(model, learning_rate=1e-3)
    rng = np.random.RandomState(0)
    audio = (rng.randn(4, 16000) * 0.1).astype(np.float32)
    tags = np.zeros((4, 527), np.float32)
    tags[:2, 0] = 1
    tags[2:, 1] = 1
    batch = {"audio": audio, "tags": tags}

    saved = []
    history = trainer.fit(
        train_loader_fn=lambda: [batch],
        val_loader_fn=lambda: [batch],
        epochs=2,
        checkpoint_fn=lambda epoch, mAP: saved.append((epoch, mAP)),
    )
    assert len(history) == 2 and all(np.isfinite(history))
    assert [e for e, _ in saved] == [1, 2]
    """Command shapes match the reference youtube-dl/ffmpeg invocations
    (audiocaps.py:688-732) argument for argument."""
    from audioset_convnext_inf_tpu.data.audiocaps import (
        ffmpeg_extract_command,
        youtube_url_command,
    )

    assert youtube_url_command("abc123") == [
        "youtube-dl",
        "--youtube-skip-dash-manifest",
        "-g",
        "https://www.youtube.com/watch?v=abc123",
    ]
    cmd = ffmpeg_extract_command("http://a/stream", "/out/yt_10.flac", 10)
    assert cmd == [
        "ffmpeg", "-i", "http://a/stream", "-vn", "-f", "flac", "-acodec",
        "flac", "-ss", "10", "-t", "10.00096876", "-ar", "32000", "-ac", "1",
        "/out/yt_10.flac",
    ]


def test_prepare_audiocaps_subset_with_mock_runners(tmp_path):
    """The download pipeline walks the captions CSV and issues the right
    command pairs; runners are injected (no network in this environment).
    Uses its own root (not the shared fixture) because the fake downloads
    mutate the audio directory."""
    from audioset_convnext_inf_tpu.data.audiocaps import prepare_audiocaps_subset

    prep_root = tmp_path / "prep_root"
    data = prep_root / "AUDIOCAPS_32000Hz"
    data.mkdir(parents=True)
    lines = ["audiocap_id,youtube_id,start_time,caption\n"] + [
        f"{i},yttrain{i:04d},10,a caption\n" for i in range(4)
    ]
    (data / "train.csv").write_text("".join(lines))

    issued = {"url": [], "extract": []}

    def fake_output(cmd):
        issued["url"].append(cmd)
        return b"http://video\nhttp://audio\n"

    def fake_call(cmd):
        issued["extract"].append(cmd)
        open(cmd[-1], "wb").close()  # "download" the file
        return 0

    counts = prepare_audiocaps_subset(
        str(prep_root), "train", run_output=fake_output, run_call=fake_call
    )
    assert counts == {"ok": 4, "err": 0, "skipped": 0}
    assert len(issued["url"]) == 4 and len(issued["extract"]) == 4
    assert issued["url"][0][-1].endswith("watch?v=yttrain0000")
    assert issued["extract"][0][2] == "http://audio"
    # second run: everything already on disk (the fake downloads are empty
    # files, so accept them explicitly for the skip assertion)
    counts2 = prepare_audiocaps_subset(
        str(prep_root), "train", run_output=fake_output, run_call=fake_call,
        validate_cache=lambda p: True,
    )
    assert counts2 == {"ok": 0, "err": 0, "skipped": 4}
    # third run with the real validator: the zero-byte leftovers are
    # detected as corrupt, removed, and re-downloaded (reference
    # __check_file semantics - the cache self-repairs)
    counts3 = prepare_audiocaps_subset(
        str(prep_root), "train", run_output=fake_output, run_call=fake_call
    )
    assert counts3["ok"] == 4 and counts3["skipped"] == 0
    # missing captions CSV raises with the official URL
    with pytest.raises(FileNotFoundError, match="cdjkim/audiocaps"):
        prepare_audiocaps_subset(str(tmp_path), "test")
