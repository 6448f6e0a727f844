"""CLI end-to-end smoke tests (in-process, virtual CPU devices)."""

import os

import numpy as np
import pytest

from tests.make_synth_hdf5 import make_packed_and_index


def test_demo_cli(sample_wav_path, capsys):
    from audioset_convnext_inf_tpu.cli.demo import main

    rc = main([sample_wav_path, "--threshold", "0.9"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "# params: 28222767" in out
    assert "logits size: (1, 527)" in out
    assert "Scene embedding, shape: (1, 768)" in out
    assert "Frame-level embeddings, shape: (1, 768, 31, 7)" in out


def test_convert_cli_roundtrip(tmp_path, capsys):
    """native -> safetensors -> load again; head weights bit-identical."""
    import jax

    from audioset_convnext_inf_tpu.checkpoint import load_pretrained, save_checkpoint
    from audioset_convnext_inf_tpu.cli.convert import main
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(1), cfg)
    native = str(tmp_path / "native_ck")
    save_checkpoint(native, params, cfg)

    st = str(tmp_path / "model.safetensors")
    assert main([native, st, "--to", "safetensors"]) == 0
    params2 = load_pretrained(st, cfg)
    np.testing.assert_array_equal(
        np.asarray(params["head"]["w"]), np.asarray(params2["head"]["w"])
    )


def test_demo_cli_with_safetensors_checkpoint(tmp_path, sample_wav_path, capsys):
    """from_pretrained(.safetensors) through the demo CLI - the exact path a
    user of the published checkpoint takes."""
    import jax

    from audioset_convnext_inf_tpu.checkpoint import save_safetensors
    from audioset_convnext_inf_tpu.cli.demo import main
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(2), cfg)
    st = str(tmp_path / "model.safetensors")
    save_safetensors(params, cfg, st)

    rc = main([sample_wav_path, "--checkpoint", st, "--threshold", "0.9"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Loaded ckpt from" in out
    assert "# params: 28222767" in out


def test_pack_and_evaluate_cli(tmp_path, capsys):
    from scipy.io import wavfile

    from audioset_convnext_inf_tpu.cli.pack_dataset import main as pack_main

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    lines = ["#\n", "#\n", "#\n"]
    for i in range(4):
        name = f"clip{i:02d}xx_0_10000.wav"
        wavfile.write(str(audio_dir / name), 32000, (rng.randn(32000) * 2000).astype(np.int16))
        lines.append(f'clip{i:02d}xx, 0.000, 10.000, "/m/09x0r"\n')
    csv = tmp_path / "m.csv"
    csv.write_text("".join(lines))

    packed = str(tmp_path / "packed.h5")
    index = str(tmp_path / "idx.h5")
    assert pack_main(["pack", "--csv", str(csv), "--audios-dir", str(audio_dir),
                      "--out", packed, "--audio-ext", ".wav"]) == 0
    assert pack_main(["index", "--waveforms", packed, "--out", index]) == 0
    assert os.path.exists(index)


def test_train_cli_two_steps(tmp_path):
    from audioset_convnext_inf_tpu.cli.train import main

    d = tmp_path / "h5"
    packed, index = make_packed_and_index(str(d), n_clips=16, clip_samples=16000)
    rc = main([
        "--train-indexes", index,
        "--model", "convnext_atto",
        "--batch-size", "8",
        "--sampler", "uniform",
        "--early-stop", "2",
        # 0 = disabled (regression: this used to ZeroDivisionError in the
        # trainer loop's modulo)
        "--eval-interval", "0",
        "--checkpoint-interval", "0",
        "--num-workers", "2",
        "--workspace", str(tmp_path / "ws"),
        "--total-steps", "100",
    ])
    assert rc == 0
    # final checkpoint was written and reloads
    ckpts = list((tmp_path / "ws" / "checkpoints" / "convnext_atto").iterdir())
    assert len(ckpts) == 1
    from audioset_convnext_inf_tpu.checkpoint import load_checkpoint

    state = load_checkpoint(str(ckpts[0]))
    assert state["iteration"] == 2
    assert state["sampler_state"] is not None


def test_train_cli_resume_matches_straight_run(tmp_path):
    """CLI-level exact resume (reference main.py --resume_iteration): train
    4 steps straight vs 2 steps -> checkpoint -> new process-state resume ->
    2 more; final params must be bit-identical (optimizer + sampler + augment
    key stream all restored). Engine-level resume has its own test; this one
    exercises the CLI wiring: checkpoint naming, sampler_state round-trip,
    trainer.restore() mesh re-placement."""
    import jax

    from audioset_convnext_inf_tpu.checkpoint import load_checkpoint
    from audioset_convnext_inf_tpu.cli.train import main

    d = tmp_path / "h5"
    packed, index = make_packed_and_index(str(d), n_clips=16, clip_samples=16000)

    def run(workspace, early_stop, resume=0):
        argv = [
            "--train-indexes", index,
            "--model", "convnext_atto",
            "--batch-size", "8",
            "--sampler", "balanced",
            "--early-stop", str(early_stop),
            "--eval-interval", "1000000",
            "--checkpoint-interval", "2",
            "--num-workers", "2",
            "--workspace", workspace,
            "--total-steps", "100",
        ]
        if resume:
            argv += ["--resume-iteration", str(resume)]
        assert main(argv) == 0

    run(str(tmp_path / "ws_a"), early_stop=4)
    run(str(tmp_path / "ws_b"), early_stop=2)
    run(str(tmp_path / "ws_b"), early_stop=4, resume=2)

    a = load_checkpoint(str(tmp_path / "ws_a" / "checkpoints" / "convnext_atto" / "4_iterations"))
    b = load_checkpoint(str(tmp_path / "ws_b" / "checkpoints" / "convnext_atto" / "4_iterations"))
    assert a["iteration"] == b["iteration"] == 4

    # data-order exactness: the post-resume sampler stream must be identical
    # (this is what the round-3 prefetch-snapshot + sampler-RNG fixes buy;
    # before them the queue refill diverged and bn0 stats drifted by ~1.0)
    sa = jax.tree_util.tree_leaves(a["sampler_state"])
    sb = jax.tree_util.tree_leaves(b["sampler_state"])
    assert len(sa) == len(sb)
    for xa, xb in zip(sa, sb):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))

    # params: identical data/key stream; tolerance only for XLA:CPU's
    # run-to-run parallel-reduction scatter (~1e-5 at atto scale), far below
    # the >=1e-3 signature of a wrong-batch resume
    flat_a = jax.tree_util.tree_leaves(a["params"])
    flat_b = jax.tree_util.tree_leaves(b["params"])
    assert len(flat_a) == len(flat_b)
    for xa, xb in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb), atol=2e-4)


def test_verify_checkpoint_gate(tmp_path):
    """The checkpoint-arrival gate runs end-to-end on a synthetic checkpoint:
    param count + shape checks PASS, golden-index check FAILS (random
    weights), exit code 1. With the real 471mAP weights the same command
    must exit 0."""
    import sys

    sys.path.insert(0, "scripts")
    try:
        import verify_checkpoint
    finally:
        sys.path.pop(0)

    import jax
    from audioset_convnext_inf_tpu.checkpoint.io import save_safetensors
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(0), cfg)
    ckpt = str(tmp_path / "model.safetensors")
    save_safetensors(params, cfg, ckpt)

    rc = verify_checkpoint.main(
        [ckpt, "--wav", "tests/fixtures/f62-S-v2swA_200000_210000.wav"]
    )
    assert rc == 1  # random weights cannot reproduce the golden indexes


def test_convert_cli_preserves_nondefault_config(tmp_path):
    """Converting a native checkpoint of a non-tiny model must use ITS
    config (not assume convnext_tiny) so the output round-trips with the
    right architecture; flat inputs take --model."""
    import jax

    from audioset_convnext_inf_tpu.checkpoint import (load_checkpoint,
                                                      save_checkpoint)
    from audioset_convnext_inf_tpu.cli.convert import main
    from audioset_convnext_inf_tpu.config import ConvNeXtConfig
    from audioset_convnext_inf_tpu.models import convnext as F

    cfg = ConvNeXtConfig(name="convnext_atto", depths=(2, 2, 6, 2),
                         dims=(40, 80, 160, 320), drop_path_rate=0.0)
    params = F.init_params(jax.random.PRNGKey(1), cfg)
    native = str(tmp_path / "atto_ck")
    save_checkpoint(native, params, cfg)

    out = str(tmp_path / "atto_out")
    assert main([native, out, "--to", "native"]) == 0
    state = load_checkpoint(out)
    assert state["config"].dims == (40, 80, 160, 320)
    assert state["config"].name == "convnext_atto"
    np.testing.assert_array_equal(np.asarray(params["head"]["w"]),
                                  np.asarray(state["params"]["head"]["w"]))

    # flat safetensors + --model: converter builds the matching config
    st = str(tmp_path / "atto.safetensors")
    assert main([native, st, "--to", "safetensors"]) == 0
    back = str(tmp_path / "atto_back")
    assert main([st, back, "--to", "native", "--model", "convnext_atto"]) == 0
    state2 = load_checkpoint(back)
    assert state2["config"].dims == (40, 80, 160, 320)
    np.testing.assert_array_equal(np.asarray(params["head"]["w"]),
                                  np.asarray(state2["params"]["head"]["w"]))
