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
