"""Deformable conv tests: zero-offset equivalence to regular conv, mask
scaling, and the deformable zoo models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.ops.deform_conv import deform_conv2d


def test_zero_offset_equals_regular_conv(rng):
    """With zero offsets and unit mask, deform_conv2d == plain conv."""
    b, h, w, c, o, k = 2, 9, 11, 8, 16, 3
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    weight = jnp.asarray(rng.randn(k, k, c, o) * 0.1, jnp.float32)
    offset = jnp.zeros((b, h, w, 2 * k * k))
    mask = jnp.ones((b, h, w, k * k))

    out = deform_conv2d(x, offset, weight, mask=mask, padding=(1, 1))
    ref = jax.lax.conv_general_dilated(
        x, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_integer_offset_shifts_sampling(rng):
    """A constant integer offset equals convolving a shifted input."""
    b, h, w, c, o, k = 1, 8, 8, 4, 4, 3
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    weight = jnp.asarray(rng.randn(k, k, c, o) * 0.1, jnp.float32)
    offset = jnp.zeros((b, h, w, 2 * k * k)).at[..., 1::2].set(1.0)  # dx=+1

    out = deform_conv2d(x, offset, weight, padding=(1, 1))
    x_shift = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:, :]
    ref = jax.lax.conv_general_dilated(
        x_shift, weight, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # interior matches exactly; edges differ by the zero-pad convention
    np.testing.assert_allclose(
        np.asarray(out)[:, 1:-1, 1:-2], np.asarray(ref)[:, 1:-1, 1:-2], atol=1e-4
    )


def test_mask_scales_output(rng):
    b, h, w, c, o, k = 1, 6, 6, 4, 4, 3
    x = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    weight = jnp.asarray(rng.randn(k, k, c, o) * 0.1, jnp.float32)
    offset = jnp.zeros((b, h, w, 2 * k * k))
    half = deform_conv2d(x, offset, weight, mask=jnp.full((b, h, w, k * k), 0.5))
    full = deform_conv2d(x, offset, weight, mask=jnp.ones((b, h, w, k * k)))
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5, atol=1e-5)


@pytest.mark.parametrize("name", ["Cnn14Deformable", "Cnn6Deformable", "Cnn14SepPW"])
def test_deformable_and_seppw_models(name, rng):
    from audioset_convnext_inf_tpu.models.pann import create_pann_model

    model = create_pann_model(name, seed=0)
    x = (rng.randn(1, 32000) * 0.1).astype(np.float32)
    out = model.forward(x)
    assert out["clipwise_output"].shape == (1, 527)
    assert np.isfinite(np.asarray(out["clipwise_output"])).all()
