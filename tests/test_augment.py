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


def test_speed_perturb_static_shape_and_zero_tail():
    x = jnp.asarray(np.linspace(-1, 1, 1000, dtype=np.float32))
    out = speed_perturb(jax.random.PRNGKey(5), x, rates=(1.5, 1.5), p=1.0)
    assert out.shape == x.shape
    arr = np.asarray(out)
    # rate 1.5 speeds up: content ends at ~2/3 of the clip... rate>1 means
    # the stretched signal is longer than needed, so the full window is
    # populated by resampled content
    assert np.isfinite(arr).all()
    slow = np.asarray(speed_perturb(jax.random.PRNGKey(5), x, rates=(0.5, 0.5), p=1.0))
    # rate 0.5: only half the target length is available -> zero tail
    assert np.all(slow[500:] == 0)
    # p=0 never applies
    same = speed_perturb(jax.random.PRNGKey(5), x, rates=(0.5, 0.5), p=0.0)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(x))
