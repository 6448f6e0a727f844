"""Functional building blocks shared by the model zoo.

Everything operates on plain pytrees (nested dicts of jnp arrays) and NHWC
layouts. The reference's ConvNeXt block permutes NCHW<->NHWC around its
LayerNorm/MLP (pytorch/convnext.py:74-87); here the whole network is NHWC
end-to-end so those permutes vanish and XLA keeps MXU-friendly layouts.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# ---------------------------------------------------------------------------
# Initializers (behavioral match of pytorch/timm_weight_init.py:12-73)
# ---------------------------------------------------------------------------


def trunc_normal(
    key: jax.Array,
    shape: Sequence[int],
    std: float = 0.02,
    mean: float = 0.0,
    a: float = -2.0,
    b: float = 2.0,
    dtype=jnp.float32,
) -> Array:
    """Truncated normal via inverse-CDF of a truncated uniform.

    Same method as timm's ``trunc_normal_`` (timm_weight_init.py:12-46): the
    [a, b] bounds apply to the *final* distribution (mean/std included).
    """
    lo = (1.0 + math.erf(((a - mean) / std) / math.sqrt(2.0))) / 2.0
    hi = (1.0 + math.erf(((b - mean) / std) / math.sqrt(2.0))) / 2.0
    u = jax.random.uniform(key, tuple(shape), dtype, 2 * lo - 1, 2 * hi - 1)
    x = jax.scipy.special.erfinv(u) * (std * math.sqrt(2.0)) + mean
    return jnp.clip(x, a, b)


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def layer_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-6) -> Array:
    """LayerNorm over the trailing (channel) axis, float32 statistics.

    Matches torch ``F.layer_norm`` / the reference's channels_last LayerNorm
    (convnext.py:531-535). Accepts bf16 activations; normalization runs in
    f32 and the result is cast back.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    # single-pass moments (E[x^2] - E[x]^2): one fewer sweep over the
    # activation than the subtract-then-square form, same result in f32
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(mean_sq - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(dtype)


def init_layer_norm(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def batch_norm_apply(
    x: Array,
    params: dict,
    eps: float = 1e-5,
    axis: int = -1,
) -> Array:
    """Inference-mode BatchNorm using running statistics.

    The reference applies ``BatchNorm2d(224)`` over the mel axis by
    transposing it into channel position (convnext.py:304-306). In NHWC we
    simply normalize the trailing mel axis - algebraically identical, no
    transposes. Folds to a single scale/shift.
    """
    shape = [1] * x.ndim
    shape[axis] = -1
    mean = params["mean"].reshape(shape)
    var = params["var"].reshape(shape)
    scale = params["scale"].reshape(shape)
    bias = params["bias"].reshape(shape)
    inv = jax.lax.rsqrt(var + eps) * scale
    return (x.astype(jnp.float32) * inv + (bias - mean * inv)).astype(x.dtype)


def batch_norm_train(
    x: Array, params: dict, eps: float = 1e-5, momentum: float = 0.1, axis: int = -1
) -> Tuple[Array, dict]:
    """Training-mode BatchNorm over ``axis``; returns (y, new_running_stats).

    Reduces over all other axes (torch BatchNorm2d semantics with the target
    axis as channels). Running stats update uses torch's convention:
    running = (1 - momentum) * running + momentum * batch_stat, with the
    *unbiased* variance entering the running average.
    """
    xf = x.astype(jnp.float32)
    reduce_axes = tuple(i for i in range(x.ndim) if i != (axis % x.ndim))
    n = int(np.prod([x.shape[i] for i in reduce_axes]))
    mean_k = jnp.mean(xf, axis=reduce_axes, keepdims=True)
    var_k = jnp.mean(jnp.square(xf - mean_k), axis=reduce_axes, keepdims=True)
    shape = [1] * x.ndim
    shape[axis] = -1
    inv = jax.lax.rsqrt(var_k + eps) * params["scale"].reshape(shape)
    y = xf * inv + (params["bias"].reshape(shape) - mean_k * inv)
    mean = mean_k.reshape(-1)
    var = var_k.reshape(-1)
    unbiased = var * (n / max(n - 1, 1))
    new_stats = {
        "mean": (1 - momentum) * params["mean"] + momentum * mean,
        "var": (1 - momentum) * params["var"] + momentum * unbiased,
        "scale": params["scale"],
        "bias": params["bias"],
    }
    return y.astype(x.dtype), new_stats


def init_batch_norm(dim: int) -> dict:
    return {
        "scale": jnp.ones((dim,)),
        "bias": jnp.zeros((dim,)),
        "mean": jnp.zeros((dim,)),
        "var": jnp.ones((dim,)),
    }


# ---------------------------------------------------------------------------
# Convolutions (NHWC, HWIO weights)
# ---------------------------------------------------------------------------


def conv2d(
    x: Array,
    w: Array,
    b: Optional[Array] = None,
    stride: Tuple[int, int] = (1, 1),
    padding="VALID",
    feature_group_count: int = 1,
) -> Array:
    """NHWC conv with HWIO weights.

    MXU accumulation is f32 internally regardless of output dtype; we only
    request an f32 *output* for f32 inputs. For bf16 inputs the output stays
    bf16 - asking for f32 there makes the conv's transpose (gradient) rule
    mix an f32 cotangent with bf16 weights and fail under autodiff.
    """
    if isinstance(padding, tuple):
        padding = [(p, p) for p in padding]
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=feature_group_count,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def linear(x: Array, w: Array, b: Optional[Array] = None) -> Array:
    """x @ w (+ b); w stored (in, out); accumulate f32, keep activation dtype."""
    y = jnp.einsum("...i,io->...o", x, w.astype(x.dtype), preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def init_conv(
    key: jax.Array, kh: int, kw: int, in_ch: int, out_ch: int, std: float = 0.02
) -> dict:
    return {
        "w": trunc_normal(key, (kh, kw, in_ch, out_ch), std=std),
        "b": jnp.zeros((out_ch,)),
    }


def init_linear(key: jax.Array, in_dim: int, out_dim: int, std: float = 0.02) -> dict:
    return {"w": trunc_normal(key, (in_dim, out_dim), std=std), "b": jnp.zeros((out_dim,))}


# ---------------------------------------------------------------------------
# Stochastic depth (reference convnext.py:90-127)
# ---------------------------------------------------------------------------


def drop_path(
    x: Array, key: Optional[jax.Array], drop_prob: float, scale_by_keep: bool = True
) -> Array:
    """Per-sample residual drop. ``key=None`` means eval mode (identity)."""
    if drop_prob == 0.0 or key is None:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, keep_prob, shape).astype(x.dtype)
    if scale_by_keep:
        mask = mask / keep_prob
    return x * mask


def gelu(x: Array) -> Array:
    """Exact (erf) GELU - torch ``nn.GELU()`` default, not tanh approx."""
    return jax.nn.gelu(x, approximate=False)
