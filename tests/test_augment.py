"""Waveform augmentation op tests (ops/augment.py vs augmentations.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.ops.augment import (
    crop,
    gain_augment,
    pad,
    pad_or_truncate,
    roll_augment,
    speed_perturb,
)


def test_crop_alignments():
    x = jnp.arange(10.0)
    np.testing.assert_array_equal(np.asarray(crop(x, 4, "left")), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(crop(x, 4, "right")), [6, 7, 8, 9])
    # center: start = diff//2 + diff%2 = 3 (augmentations.py:53-62)
    np.testing.assert_array_equal(np.asarray(crop(x, 4, "center")), [3, 4, 5, 6])
    out = crop(x, 4, "random", key=jax.random.PRNGKey(0))
    assert out.shape == (4,)
    assert np.all(np.diff(np.asarray(out)) == 1)  # contiguous window


def test_pad_alignments():
    x = jnp.ones(4)
    np.testing.assert_array_equal(np.asarray(pad(x, 7, "left")), [1, 1, 1, 1, 0, 0, 0])
    np.testing.assert_array_equal(np.asarray(pad(x, 7, "right")), [0, 0, 0, 1, 1, 1, 1])
    # center: left gets missing//2 + missing%2 = 2 (augmentations.py:177-189)
    np.testing.assert_array_equal(np.asarray(pad(x, 7, "center")), [0, 0, 1, 1, 1, 1, 0])
    out = np.asarray(pad(x, 7, "random", key=jax.random.PRNGKey(1)))
    assert out.sum() == 4 and out.shape == (7,)


def test_pad_or_truncate_matches_host_version():
    from audioset_convnext_inf_tpu.data.audio_io import pad_or_truncate as host_pot

    x = np.arange(10, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(pad_or_truncate(jnp.asarray(x), 6)), host_pot(x, 6))
    np.testing.assert_array_equal(np.asarray(pad_or_truncate(jnp.asarray(x), 14)), host_pot(x, 14))


def test_gain_augment_is_integer_db():
    x = jnp.ones(100)
    out = np.asarray(gain_augment(jax.random.PRNGKey(3), x, gain_db=7))
    db = 20 * np.log10(out[0])
    assert abs(db - round(db)) < 1e-4
    assert -7 <= round(db) <= 6  # randint(0, 14) - 7


def test_roll_augment_is_circular():
    x = jnp.arange(100.0)
    out = np.asarray(roll_augment(jax.random.PRNGKey(2), x, shift_range=50))
    assert sorted(out.tolist()) == sorted(x.tolist())
    assert not np.array_equal(out, np.asarray(x)) or True  # shift may be 0


def _np_speed_perturb(x, rate, align):
    """Numpy emulation of the reference chain resample_nearest -> Pad -> Crop
    (augmentations.py:266-275, 196-204, 72-81) for deterministic aligns."""
    length = x.shape[-1]
    idx = np.arange(0, length, 1.0 / rate, dtype=np.float64)
    stretched = x[np.clip(np.round(idx).astype(np.int64), 0, length - 1)]
    s = stretched.shape[-1]
    if s < length:  # Pad
        missing = length - s
        left = {"left": 0, "right": missing, "center": missing // 2 + missing % 2}[align]
        stretched = np.pad(stretched, (left, missing - left))
    if stretched.shape[-1] > length:  # Crop
        diff = stretched.shape[-1] - length
        start = {"left": 0, "right": diff, "center": diff // 2 + diff % 2}[align]
        stretched = stretched[start : start + length]
    return stretched


@pytest.mark.parametrize("align", ["left", "right", "center"])
@pytest.mark.parametrize("rate", [0.5, 0.73, 1.0, 1.31, 1.5])
def test_speed_perturb_matches_reference_chain(align, rate):
    x = jnp.asarray(np.linspace(1.0, 2.0, 1000, dtype=np.float32))
    out = np.asarray(
        speed_perturb(jax.random.PRNGKey(5), x, rates=(rate, rate), p=1.0, align=align)
    )
    np.testing.assert_array_equal(out, _np_speed_perturb(np.asarray(x), rate, align))


def test_speed_perturb_random_align_distribution():
    x = jnp.asarray(np.linspace(1.0, 2.0, 1000, dtype=np.float32))  # strictly > 0
    starts = []
    for seed in range(20):
        out = np.asarray(
            speed_perturb(jax.random.PRNGKey(seed), x, rates=(0.5, 0.5), p=1.0)
        )
        assert out.shape == x.shape
        nz = np.nonzero(out)[0]
        assert len(nz) == 500  # ceil(1000*0.5) stretched samples survive
        assert nz[-1] - nz[0] == 499  # contiguous placement
        starts.append(nz[0])
    assert len(set(starts)) > 3  # offsets actually vary (align='random')
    # rate > 1: random crop keeps the full window populated
    fast = np.asarray(speed_perturb(jax.random.PRNGKey(7), x, rates=(1.5, 1.5), p=1.0))
    assert np.count_nonzero(fast) == 1000
    # p=0 never applies
    same = speed_perturb(jax.random.PRNGKey(5), x, rates=(0.5, 0.5), p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))


def _sinc_resample_direct(x, orig_freq, new_freq, W=6, rolloff=0.99):
    """Independent O(N*M) oracle for the windowed-sinc resampler, evaluated
    straight from the continuous-time reconstruction formula (the spec the
    polyphase-GEMM implementation factorizes):

        out[i] = scale * sum_j x[j] * sinc(pi f_c tau) * cos(pi f_c tau/(2W))^2,
        tau = j/orig - i/new, |f_c tau| <= W, f_c = rolloff*min(orig,new),
        scale = f_c/orig

    No framing, no strides, no kernel bank - just the sum."""
    import math

    g = math.gcd(orig_freq, new_freq)
    orig_freq, new_freq = orig_freq // g, new_freq // g
    fc = rolloff * min(orig_freq, new_freq)
    L = len(x)
    out = np.zeros(math.ceil(new_freq * L / orig_freq))
    j = np.arange(L, dtype=np.float64)
    for i in range(len(out)):
        t = fc * (j / orig_freq - i / new_freq)
        m = np.abs(t) <= W
        tm = t[m]
        sinc = np.where(tm == 0, 1.0, np.sin(np.pi * tm) / np.where(tm == 0, 1.0, np.pi * tm))
        out[i] = (x[m] * sinc * np.cos(np.pi * tm / (2 * W)) ** 2).sum()
    return (fc / orig_freq) * out


@pytest.mark.parametrize("rate", [0.5, 0.737, 1.29, 1.5])
def test_resample_linear_matches_direct_formula(rate):
    from audioset_convnext_inf_tpu.ops.augment import resample_linear

    rng = np.random.RandomState(0)
    x = rng.randn(1777).astype(np.float32)
    out = resample_linear(x, rate, sample_rate=32000)
    ref = _sinc_resample_direct(x.astype(np.float64), 32000, int(32000 * rate))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_resample_linear_identity_and_lengths():
    from audioset_convnext_inf_tpu.ops.augment import resample_linear

    import math

    x = np.random.RandomState(1).randn(1000).astype(np.float32)
    np.testing.assert_array_equal(resample_linear(x, 1.0), x)
    for rate in (0.5, 0.9, 1.1, 2.0):
        new = int(32000 * rate)
        g = math.gcd(32000, new)
        expect = math.ceil((new // g) * 1000 / (32000 // g))
        assert resample_linear(x, rate).shape == (expect,)
    # batched 2-D input resamples each row
    xb = np.stack([x, 2 * x])
    ob = resample_linear(xb, 0.5)
    np.testing.assert_allclose(ob[1], 2 * ob[0], rtol=1e-6)


def test_resample_linear_preserves_tone_frequency():
    """A pure tone resampled by rate r lands at f/r cycles-per-sample: the
    sinc path is a real RESAMPLER (band-limited interpolation), unlike the
    aliasing nearest-neighbor gather."""
    from audioset_convnext_inf_tpu.ops.augment import resample_linear

    sr, f0, rate = 32000, 2000.0, 1.25
    n = 4000
    x = np.sin(2 * np.pi * f0 * np.arange(n) / sr).astype(np.float32)
    y = resample_linear(x, rate, sample_rate=sr)
    spec = np.abs(np.fft.rfft(y[200:-200] * np.hanning(len(y) - 400)))
    peak = np.argmax(spec) / (len(y) - 400)  # cycles per output sample
    assert abs(peak - (f0 / sr) / rate) < 2e-4


def test_resample_dispatcher():
    from audioset_convnext_inf_tpu.ops.augment import resample, resample_linear

    x = np.random.RandomState(2).randn(500).astype(np.float32)
    # nearest: the reference's round(i/rate) gather (augmentations.py:266-275)
    idx = np.round(np.arange(0, 500, 1 / 0.8)).astype(np.int64)
    np.testing.assert_array_equal(resample(x, 0.8, "nearest"), x[np.minimum(idx, 499)])
    np.testing.assert_array_equal(resample(x, 0.8, "linear"), resample_linear(x, 0.8))
    with pytest.raises(ValueError):
        resample(x, 0.8, "cubic")


def test_resample_linear_quantize_hz_bounds_kernel():
    """A near-coprime rate (continuous U(rates) sampling) would build a
    ~GB float bank; quantize_hz bounds it to ~MB at <=0.16% rate error."""
    from audioset_convnext_inf_tpu.ops.augment import (
        resample_linear,
        sinc_resample_kernel,
    )

    x = np.random.RandomState(3).randn(4000).astype(np.float32)
    out = resample_linear(x, 0.73715, quantize_hz=100)
    # quantized target: round(32000*0.73715/100)*100 = 23600 -> exact path
    ref = resample_linear(x, 23600 / 32000.0)
    np.testing.assert_array_equal(out, ref)
    k, _ = sinc_resample_kernel(32000 // 400, 23600 // 400)  # gcd=400
    assert k.nbytes < 2**21  # the quantized bank stays under 2 MB


def test_resample_linear_big_banks_bypass_cache():
    """Unquantized near-coprime rates (continuous U(rates) sampling, the
    reference default) build ~GB kernel banks; those must NOT be pinned in
    the lru_cache (32 of them would leak tens of GB of host RAM), while
    quantized/repeated small banks still cache."""
    from audioset_convnext_inf_tpu.ops.augment import (
        _cacheable_bank,
        sinc_resample_kernel,
    )

    # coprime with 32000 (continuous rate draw): ~3 GB bank -> uncached
    assert not _cacheable_bank(32000, 23587, 6, 0.99)
    assert not _cacheable_bank(32000, 32063, 6, 0.99)
    # quantize_hz=100-style reduced pairs: ~KB..MB banks -> cached
    assert _cacheable_bank(80, 59, 6, 0.99)        # gcd-reduced 32000/23600
    assert _cacheable_bank(320, 127, 6, 0.99)
    # dispatch wiring: a small-bank call actually goes through the cache
    # (second identical call is a hit; earlier tests may have primed it)
    from audioset_convnext_inf_tpu.ops.augment import resample_linear

    x = np.zeros(1000, np.float32)
    resample_linear(x, 0.5)  # reduced pair (2, 1): tiny cached bank
    hits_before = sinc_resample_kernel.cache_info().hits
    resample_linear(x, 0.5)
    assert sinc_resample_kernel.cache_info().hits == hits_before + 1
