"""Native FLAC decoder (native/flac_decode.cpp) vs the independent Python
encoder in tests/flac_encoder.py.

The reference's packing flow reads AudioSet clips from .flac files through
libsndfile (utils/dataset.py:202); this image has no FLAC tooling, so the
data plane ships a first-party decoder. Every decoder path is exercised:
subframe kinds, Rice methods + escapes + partition orders, wasted bits,
stereo decorrelation, bit depths, ragged last frame, multi-byte frame
numbers, CRC rejection, and the read_audio dispatch + pack integration.
"""

import numpy as np
import pytest

from audioset_convnext_inf_tpu.utils import native
from tests.flac_encoder import encode_flac

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _smooth_int16(n, seed=0, amp=8000):
    """Smooth-ish signal: fixed predictors get small residuals."""
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 320.0
    x = amp * np.sin(2 * np.pi * t) + 300 * rng.randn(n)
    return np.round(x).astype(np.int64)


def _decode(buf, mono=True):
    out = native.decode_flac_bytes(buf, mono=mono)
    assert out is not None, "native decoder rejected a valid stream"
    return out


@pytest.mark.parametrize("kind,order", [("fixed", 0), ("fixed", 1),
                                        ("fixed", 2), ("fixed", 3),
                                        ("fixed", 4), ("verbatim", 0)])
def test_mono_roundtrip_subframe_kinds(kind, order):
    x = _smooth_int16(3000)  # blocksize 1024 -> ragged last frame (952)
    buf = encode_flac(x, 32000, bps=16, blocksize=1024, kind=kind, order=order)
    y, sr = _decode(buf)
    assert sr == 32000
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-9)


def test_constant_subframes():
    x = np.full(2048, -1234, np.int64)
    buf = encode_flac(x, 16000, bps=16, blocksize=1024, kind="constant")
    y, sr = _decode(buf)
    assert sr == 16000
    np.testing.assert_allclose(y, -1234 / 32768.0, atol=1e-9)


@pytest.mark.parametrize("coefs,shift", [([3, -1], 0), ([5, -4, 1], 1),
                                         ([14, -11, 4, -1, 1, 0, 0, 1], 3)])
def test_lpc_subframes(coefs, shift):
    x = _smooth_int16(2500, seed=3)
    buf = encode_flac(x, 44100, bps=16, blocksize=512, kind="lpc",
                      lpc_coefs=coefs, lpc_shift=shift, lpc_precision=12)
    y, sr = _decode(buf)
    assert sr == 44100
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-9)


@pytest.mark.parametrize("method", [0, 1])
@pytest.mark.parametrize("po", [0, 2])
def test_rice_methods_and_partition_orders(method, po):
    x = _smooth_int16(2048, seed=5)
    buf = encode_flac(x, 32000, bps=16, blocksize=1024, kind="fixed",
                      order=2, po=po, method=method)
    np.testing.assert_allclose(_decode(buf)[0], x / 32768.0, atol=1e-9)


def test_escape_partitions():
    x = _smooth_int16(1024, seed=7)
    buf = encode_flac(x, 32000, bps=16, blocksize=1024, kind="fixed",
                      order=2, po=2, escape_partitions=(1, 3))
    np.testing.assert_allclose(_decode(buf)[0], x / 32768.0, atol=1e-9)


def test_wasted_bits():
    x = _smooth_int16(1500, seed=9) & ~0x7  # 3 shared low zero bits
    buf = encode_flac(x, 32000, bps=16, blocksize=512, kind="fixed", order=1)
    np.testing.assert_allclose(_decode(buf)[0], x / 32768.0, atol=1e-9)


@pytest.mark.parametrize("mode", ["independent", "left_side", "right_side",
                                  "mid_side"])
def test_stereo_decorrelation_modes(mode):
    l = _smooth_int16(2000, seed=11)
    r = _smooth_int16(2000, seed=12, amp=6000)
    x = np.stack([l, r], axis=1)
    buf = encode_flac(x, 48000, bps=16, blocksize=1024, stereo_mode=mode,
                      kind="fixed", order=2)
    y, sr = _decode(buf, mono=False)
    assert sr == 48000 and y.shape == (2000, 2)
    np.testing.assert_allclose(y[:, 0], l / 32768.0, atol=1e-9)
    np.testing.assert_allclose(y[:, 1], r / 32768.0, atol=1e-9)
    # mono mean matches the channel average (dataset.py:204-207 semantics)
    ym, _ = _decode(buf, mono=True)
    np.testing.assert_allclose(ym, (l + r) / 2.0 / 32768.0, atol=1e-9)


@pytest.mark.parametrize("bps,scale", [(8, 128.0), (16, 32768.0),
                                       (24, 8388608.0)])
def test_bit_depths(bps, scale):
    amp = int(scale * 0.4)
    x = np.round(amp * np.sin(np.arange(1200) / 50.0)).astype(np.int64)
    buf = encode_flac(x, 32000, bps=bps, blocksize=256, kind="fixed", order=2)
    np.testing.assert_allclose(_decode(buf)[0], x / scale, atol=1e-9)


def test_sample_size_from_streaminfo_and_many_frames():
    """ss code 0 (bits from STREAMINFO) + >128 frames (2-byte UTF-8 numbers)."""
    x = _smooth_int16(192 * 140, seed=13)
    buf = encode_flac(x, 32000, bps=16, blocksize=192, kind="fixed", order=2,
                      ss_from_streaminfo=True)
    np.testing.assert_allclose(_decode(buf)[0], x / 32768.0, atol=1e-9)


def test_mixed_subframe_kinds_across_frames():
    kinds = ["fixed", "verbatim", "lpc", "fixed"]
    x = _smooth_int16(4096, seed=15)
    buf = encode_flac(x, 32000, bps=16, blocksize=1024,
                      per_frame_kind=lambda i: kinds[i % 4])
    np.testing.assert_allclose(_decode(buf)[0], x / 32768.0, atol=1e-9)


def test_crc_corruption_rejected():
    x = _smooth_int16(1024)
    buf = bytearray(encode_flac(x, 32000, bps=16, blocksize=1024))
    buf[len(buf) // 2] ^= 0x40  # flip a bit inside a frame
    assert native.decode_flac_bytes(bytes(buf)) is None


def test_truncated_stream_rejected():
    x = _smooth_int16(1024)
    buf = encode_flac(x, 32000, bps=16, blocksize=1024)
    assert native.decode_flac_bytes(buf[: len(buf) - 8]) is None


def test_read_audio_dispatch(tmp_path):
    from scipy.io import wavfile

    from audioset_convnext_inf_tpu.data.audio_io import read_audio

    x = _smooth_int16(2000)
    fpath = tmp_path / "clip.flac"
    fpath.write_bytes(encode_flac(x, 32000, bps=16, blocksize=1024))
    y, sr = read_audio(str(fpath))
    assert sr == 32000
    np.testing.assert_allclose(y, x / 32768.0, atol=1e-9)

    wpath = tmp_path / "clip.wav"
    wavfile.write(str(wpath), 32000, x.astype(np.int16))
    yw, srw = read_audio(str(wpath))
    assert srw == 32000 and len(yw) == 2000

    # resample through the shared path
    y16, sr16 = read_audio(str(fpath), target_sr=16000)
    assert sr16 == 16000 and len(y16) == 1000


def test_pack_flow_reads_flac(tmp_path):
    """End-to-end: pack_waveforms_to_hdf5 over .flac clips (the reference's
    AudioSet layout, dataset.py:202 + utilities.py:62-124 naming)."""
    import h5py

    from audioset_convnext_inf_tpu.data.pack import pack_waveforms_to_hdf5

    audio_dir = tmp_path / "audios"
    audio_dir.mkdir()
    names = ["1abc_1000_11000.flac", "2def_2000_12000.flac"]
    waves = []
    for i, name in enumerate(names):
        x = _smooth_int16(32000 * 2, seed=20 + i)
        (audio_dir / name).write_bytes(encode_flac(x, 32000, bps=16,
                                                   blocksize=4096))
        waves.append(x)
    csv = tmp_path / "meta.csv"
    csv.write_text(
        "# header\n# header\n# header\n"
        '1abc, 1.000, 11.000, "/m/09x0r"\n'
        '2def, 2.000, 12.000, "/m/05zppz"\n'
    )
    out = tmp_path / "packed.h5"
    pack_waveforms_to_hdf5(str(csv), str(audio_dir), str(out),
                           audio_ext=".flac")
    with h5py.File(out, "r") as f:
        assert f["waveform"].shape[0] == 2
        w0 = f["waveform"][0]
        assert w0.dtype == np.int16
        # first 64000 samples survive the decode->pad_or_truncate->int16 trip
        np.testing.assert_allclose(w0[:64000] / 32767.0,
                                   waves[0] / 32768.0, atol=2e-4)
        assert (w0[64000:] == 0).all()


def test_dense_multichannel_silence_not_refused_by_alloc_bound():
    """The allocation bound must not scale down with channel count:
    8-channel silence at blocksize 65535 (CONSTANT subframes) legitimately
    packs >8192 sample-values per stream byte - the per-frame cost floor
    is per FRAME plus ~2 bytes per channel, so samples-PER-CHANNEL is what
    the bound limits (utils/native.py::decode_flac_bytes)."""
    n = 2 * 65535
    x = np.zeros((n, 8), np.int64)
    buf = encode_flac(x, 32000, bps=16, blocksize=65535, kind="constant")
    # sanity: this valid stream is denser than the buggy 8192 values/byte
    # limit (110 bytes for ~1M sample values), so the old per-value bound
    # rejected it
    assert n * 8 > len(buf) * 8192
    y, sr = _decode(buf, mono=False)
    assert sr == 32000
    assert y.shape == (n, 8)
    assert not y.any()
