"""Mixup for multi-label audio tagging.

Paired-batch convention of the reference (pytorch_utils.py:20-36 +
utilities.py:251-270): a batch of 2B clips is mixed pairwise
(even indexes with odd indexes) into B clips using lambda drawn from
Beta(alpha, alpha); the same mixing applies to the multi-hot targets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def get_mixup_lambda(key: jax.Array, batch_size: int, alpha: float) -> Array:
    """(batch_size,) lambdas: pairs (lam, 1-lam), lam ~ Beta(alpha, alpha).

    Matches Mixup.get_lambda (utilities.py:257-270) but as a jittable PRNG
    draw instead of a stateful numpy RandomState.
    """
    lam = jax.random.beta(key, alpha, alpha, (batch_size // 2,))
    pairs = jnp.stack([lam, 1.0 - lam], axis=1).reshape(-1)
    return pairs


def do_mixup(x: Array, mixup_lambda: Array) -> Array:
    """(2B, ...) -> (B, ...): x[0::2]*lam[0::2] + x[1::2]*lam[1::2]."""
    lam = mixup_lambda.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    return x[0::2] * lam[0::2] + x[1::2] * lam[1::2]
