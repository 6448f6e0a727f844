"""Native host data-plane tests: build the .so, match numpy semantics."""

import numpy as np
import pytest

from audioset_convnext_inf_tpu.utils import native


def test_native_builds_and_loads():
    assert native.available(), "libaudiohost.so failed to build/load"


def test_int16_roundtrip(rng):
    x = rng.randint(-32768, 32768, 100000).astype(np.int16)
    f = native.int16_to_float32(x)
    np.testing.assert_allclose(f, x / 32767.0, atol=1e-7)
    back = native.float32_to_int16(f)
    # float32 scale/rescale truncation costs at most 1 LSB (same as numpy)
    assert np.abs(back.astype(np.int32) - x.clip(-32767, 32767).astype(np.int32)).max() <= 1


def test_float32_to_int16_clips(rng):
    x = np.array([-2.0, -1.0, 0.0, 0.5, 1.0, 2.0], np.float32)
    out = native.float32_to_int16(x)
    np.testing.assert_array_equal(out, [-32767, -32767, 0, 16383, 32767, 32767])


def test_decode_batch_pad_and_truncate(rng):
    x = rng.randint(-32768, 32768, (4, 1000)).astype(np.int16)
    out = native.decode_batch_int16(x, 1500)
    assert out.shape == (4, 1500)
    np.testing.assert_allclose(out[:, :1000], x / 32767.0, atol=1e-7)
    assert (out[:, 1000:] == 0).all()
    out2 = native.decode_batch_int16(x, 600)
    np.testing.assert_allclose(out2, x[:, :600] / 32767.0, atol=1e-7)


def test_decimate(rng):
    x = rng.randint(-32768, 32768, 32001).astype(np.int16)
    out = native.decimate_int16_to_float32(x, 2)
    np.testing.assert_allclose(out, x[::2] / 32767.0, atol=1e-7)


def test_audio_io_uses_same_semantics(rng):
    from audioset_convnext_inf_tpu.data.audio_io import float32_to_int16, int16_to_float32

    x = rng.randint(-32768, 32768, 5000).astype(np.int16)
    np.testing.assert_allclose(int16_to_float32(x), x / 32767.0, atol=1e-7)
    f = (rng.randn(5000) * 0.5).astype(np.float32)
    np.testing.assert_array_equal(
        float32_to_int16(f), (np.clip(f, -1, 1) * 32767.0).astype(np.int16)
    )


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_numpy_fallbacks_bit_identical_to_native(rng, monkeypatch):
    """Fallback and native decode must agree BITWISE, not just to 1e-7.

    A loader thread that loses the first-use `_load()` race (or a build-less
    host) takes the numpy path; if that path rounds differently (f64 divide
    vs the kernel's f32 reciprocal multiply, audio_host.cpp:22) the decoded
    batch differs by ~1 ulp and training stops being run-to-run
    deterministic - observed as the TRAIN_E2E divergence at step 2."""
    x = rng.randint(-32768, 32768, (4, 50000)).astype(np.int16)
    f = (rng.randn(50000) * 1.2).astype(np.float32)
    nat = {
        "i2f": native.int16_to_float32(x),
        "batch": native.decode_batch_int16(x, 60000),
        "dec": native.decimate_int16_to_float32(x[0], 4),
        "f2i": native.float32_to_int16(f),
    }
    monkeypatch.setattr(native, "_load", lambda: None)
    np.testing.assert_array_equal(native.int16_to_float32(x), nat["i2f"])
    np.testing.assert_array_equal(native.decode_batch_int16(x, 60000), nat["batch"])
    np.testing.assert_array_equal(native.decimate_int16_to_float32(x[0], 4), nat["dec"])
    np.testing.assert_array_equal(native.float32_to_int16(f), nat["f2i"])


def test_concurrent_first_use_is_deterministic(rng, monkeypatch):
    """All threads racing the very first `_load()` must produce identical
    samples. The pre-fix code set _TRIED before the (slow) build/dlopen, so
    racing threads silently took the fallback for whole batches."""
    import threading
    import time

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    real_cdll = native.ctypes.CDLL

    def slow_cdll(path, *a, **kw):  # widen the race window to ~200 ms
        time.sleep(0.2)
        return real_cdll(path, *a, **kw)

    monkeypatch.setattr(native.ctypes, "CDLL", slow_cdll)
    x = rng.randint(-32768, 32768, 32000).astype(np.int16)
    results, errs = [None] * 8, []

    def work(i):
        try:
            results[i] = native.int16_to_float32(x)
        except Exception as e:  # pragma: no cover - surface thread failures
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30)
    assert not errs
    for r in results[1:]:
        np.testing.assert_array_equal(results[0], r)


# ---------------------------------------------------------------------------
# Round-2 native additions: WAV parse/decode + polyphase resampler
# ---------------------------------------------------------------------------


def _wav_bytes(data: "np.ndarray", sr: int, bits: int, fmt: int = 1) -> bytes:
    """Hand-rolled RIFF writer for PCM 16/24/32 and float32 test vectors."""
    import struct

    ch = 1 if data.ndim == 1 else data.shape[1]
    flat = data.reshape(-1)
    if fmt == 3:
        raw = flat.astype(np.float32).tobytes()
    elif bits == 16:
        raw = flat.astype(np.int16).tobytes()
    elif bits == 24:
        raw = b"".join(struct.pack("<i", int(v) << 8)[0:3] for v in flat)
    elif bits == 32:
        raw = (flat.astype(np.int64) << 16).astype(np.int32).tobytes()
    else:
        raise ValueError(bits)
    block = ch * bits // 8
    return (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, fmt, ch, sr, sr * block, block, bits)
            + b"data" + struct.pack("<I", len(raw)) + raw)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_wav_decode_formats():
    rng = np.random.RandomState(0)
    pcm = (rng.randn(512) * 8000).astype(np.int16)

    y, sr = native.decode_wav_bytes(_wav_bytes(pcm, 16000, 16))
    assert sr == 16000
    np.testing.assert_allclose(y, pcm / 32768.0, atol=0)

    y24, _ = native.decode_wav_bytes(_wav_bytes(pcm, 32000, 24))
    np.testing.assert_allclose(y24, (pcm.astype(np.int64) << 8) / 8388608.0,
                               atol=1e-7)

    y32, _ = native.decode_wav_bytes(_wav_bytes(pcm, 32000, 32))
    np.testing.assert_allclose(y32, (pcm.astype(np.int64) << 16) / 2147483648.0,
                               atol=1e-7)

    f = (pcm / 32768.0).astype(np.float32)
    yf, _ = native.decode_wav_bytes(_wav_bytes(f, 32000, 32, fmt=3))
    np.testing.assert_allclose(yf, f, atol=0)

    # stereo downmix = channel mean; non-mono keeps channels
    st = np.stack([pcm, -pcm], 1)
    ym, _ = native.decode_wav_bytes(_wav_bytes(st, 32000, 16))
    assert np.abs(ym).max() < 1e-6
    y2, _ = native.decode_wav_bytes(_wav_bytes(st, 32000, 16), mono=False)
    assert y2.shape == (512, 2)
    np.testing.assert_allclose(y2[:, 0], pcm / 32768.0, atol=0)

    assert native.decode_wav_bytes(b"not a wav file at all") is None


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_resampler_matches_scipy():
    from scipy import signal

    x = np.random.RandomState(1).randn(12000).astype(np.float32)
    for up, down in [(1, 2), (2, 3), (160, 441), (441, 160)]:
        ref = signal.resample_poly(x.astype(np.float64), up, down)
        got = native.resample_poly_kaiser(x, up, down)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=5e-6)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_read_wav_native_path(tmp_path):
    from audioset_convnext_inf_tpu.data.audio_io import read_wav

    rng = np.random.RandomState(2)
    pcm = (rng.randn(16000) * 8000).astype(np.int16)
    p = tmp_path / "t.wav"
    p.write_bytes(_wav_bytes(pcm, 16000, 16))
    x, sr = read_wav(str(p), target_sr=32000)
    assert sr == 32000 and x.dtype == np.float32
    assert abs(len(x) - 32000) <= 1
