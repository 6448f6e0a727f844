"""Mutation fuzzing of the native audio decoders on untrusted bytes.

The ingest data plane (native/flac_decode.cpp, native/audio_host.cpp WAV
parser) parses attacker-controllable file bytes in-process via ctypes - the
production analog of the reference feeding soundfile/libsndfile arbitrary
downloads (utils/dataset.py:202). These tests assert the contract for
malformed input: every mutation of a valid stream either decodes to a
well-formed array or is rejected cleanly (``None``/exception) - never a
crash, hang, or unbounded allocation. Deterministic seeds keep the suite
reproducible.
"""

import numpy as np
import pytest

from audioset_convnext_inf_tpu.data import audio_io
from audioset_convnext_inf_tpu.utils import native
from tests.flac_encoder import encode_flac

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def _smooth_int16(n, seed=0, amp=8000):
    rng = np.random.RandomState(seed)
    t = np.arange(n) / 320.0
    x = amp * np.sin(2 * np.pi * t) + 300 * rng.randn(n)
    return np.round(x).astype(np.int64)


def _valid_flac():
    x = _smooth_int16(3000, seed=7)
    return encode_flac(x, 32000, bps=16, blocksize=1024, kind="fixed", order=2)


def _valid_wav(fmt="<h", tag=1, bits=16):
    import struct

    sr, n = 32000, 2000
    x = (np.sin(np.arange(n) / 50.0) * 12000).astype(np.int16)
    data = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt_chunk = b"fmt " + struct.pack(
        "<IHHIIHH", 16, tag, 1, sr, sr * bits // 8, bits // 8, bits
    )
    return hdr + fmt_chunk + b"data" + struct.pack("<I", len(data)) + data


def _check_flac_result(out):
    if out is None:
        return
    y, sr = out
    assert isinstance(y, np.ndarray) and y.dtype == np.float32
    assert np.all(np.isfinite(y) | np.isnan(y))  # dtype-valid memory, any value
    assert isinstance(sr, int)


def test_flac_byte_flips_never_crash():
    buf = bytearray(_valid_flac())
    rng = np.random.RandomState(0)
    for _ in range(400):
        pos = int(rng.randint(0, len(buf)))
        mutated = bytearray(buf)
        mutated[pos] ^= int(rng.randint(1, 256))
        _check_flac_result(native.decode_flac_bytes(bytes(mutated)))


def test_flac_multi_byte_corruption_never_crashes():
    buf = bytearray(_valid_flac())
    rng = np.random.RandomState(1)
    for _ in range(150):
        mutated = bytearray(buf)
        for _ in range(int(rng.randint(2, 16))):
            mutated[int(rng.randint(0, len(mutated)))] = int(rng.randint(0, 256))
        _check_flac_result(native.decode_flac_bytes(bytes(mutated)))


def test_flac_truncations_never_crash():
    buf = _valid_flac()
    # every header byte boundary + a sweep across the frame bytes
    cuts = list(range(0, min(64, len(buf)))) + list(range(64, len(buf), 7))
    for cut in cuts:
        _check_flac_result(native.decode_flac_bytes(buf[:cut]))


def test_flac_random_garbage_rejected():
    rng = np.random.RandomState(2)
    for size in (0, 1, 3, 4, 41, 42, 128, 4096):
        blob = rng.bytes(size)
        assert native.decode_flac_bytes(blob) is None or size >= 42
    # garbage that keeps the magic must still be rejected cleanly
    for _ in range(50):
        blob = b"fLaC" + rng.bytes(200)
        _check_flac_result(native.decode_flac_bytes(blob))


def test_flac_huge_claimed_total_samples_refused_before_alloc():
    """A STREAMINFO claiming 2^36-1 samples on a tiny stream must be refused
    up front (allocation bound), not after reserving ~256 GB."""
    buf = bytearray(_valid_flac())
    # STREAMINFO layout: bytes 8..41; total samples = low nibble of byte
    # 8+13 (=21) then bytes 22..25.
    buf[21] |= 0x0F
    buf[22] = buf[23] = buf[24] = buf[25] = 0xFF
    assert native.decode_flac_bytes(bytes(buf)) is None


def test_wav_byte_flips_never_crash():
    buf = bytearray(_valid_wav())
    rng = np.random.RandomState(3)
    for _ in range(400):
        mutated = bytearray(buf)
        mutated[int(rng.randint(0, len(mutated)))] ^= int(rng.randint(1, 256))
        out = native.decode_wav_bytes(bytes(mutated))
        if out is not None:
            y, sr = out
            assert y.dtype == np.float32


def test_wav_truncations_never_crash():
    buf = _valid_wav()
    for cut in list(range(0, 64)) + list(range(64, len(buf), 13)):
        native.decode_wav_bytes(buf[:cut])


def test_wav_absurd_geometry_rejected():
    import struct

    # fmt chunk claiming 0 channels / 0 bits must not divide-by-zero
    base = bytearray(_valid_wav())
    for off, val in ((22, 0), (34, 0)):  # channels, bits_per_sample
        mutated = bytearray(base)
        mutated[off:off + 2] = struct.pack("<H", val)
        assert native.decode_wav_bytes(bytes(mutated)) is None
    # data chunk size far beyond the buffer is clamped, not trusted
    mutated = bytearray(base)
    datapos = bytes(mutated).index(b"data")
    mutated[datapos + 4:datapos + 8] = struct.pack("<I", 0xFFFFFFF0)
    out = native.decode_wav_bytes(bytes(mutated))
    if out is not None:
        y, _ = out
        assert y.nbytes <= len(mutated) * 4


def test_read_audio_on_garbage_raises_cleanly(tmp_path):
    p = tmp_path / "junk.wav"
    p.write_bytes(b"RIFFxxxxWAVEjunkjunkjunk")
    with pytest.raises(Exception):
        audio_io.read_audio(str(p))
    p2 = tmp_path / "junk.flac"
    p2.write_bytes(b"fLaC" + bytes(100))
    with pytest.raises(ValueError):
        audio_io.read_audio(str(p2))
