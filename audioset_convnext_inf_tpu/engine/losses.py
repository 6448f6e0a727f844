"""Training objectives (reference pytorch/losses.py).

``clip_bce`` is the only loss the reference training loop uses
(main.py:950); here it is computed from logits with the numerically stable
log-sigmoid formulation (equivalent to BCE on sigmoid probabilities).
The F1/recall/set-accuracy objectives are ported for completeness.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

Array = jnp.ndarray


def clip_bce(output_dict: dict, target_dict: dict) -> Array:
    """Mean binary cross-entropy (losses.py:8-10), from logits."""
    logits = output_dict["clipwise_logits"]
    target = target_dict["target"].astype(jnp.float32)
    return optax.sigmoid_binary_cross_entropy(logits, target).mean()


def f1_loss_objective(binarized_output: Array, y_true: Array, average: str = "micro") -> Array:
    """Negative (micro) F1 (losses.py:20-40)."""
    eps = 1e-12
    if average == "micro":
        y_true = y_true.reshape(-1)
        binarized_output = binarized_output.reshape(-1)
    tp = jnp.sum(y_true * binarized_output, axis=0)
    pred_p = jnp.sum(binarized_output, axis=0)
    pos = jnp.sum(y_true, axis=0)
    precision = tp / (pred_p + eps)
    recall = tp / (pos + eps)
    f1 = 2 * precision * recall / (precision + recall + eps)
    return -f1.mean()


def macro_f1_loss_objective(binarized_output: Array, y_true: Array) -> Array:
    return f1_loss_objective(binarized_output, y_true, average="macro")


def set_acc_loss_objective(binarized_output: Array, y_true: Array) -> Array:
    """Negative micro true-positive count (losses.py:80-94)."""
    tp = jnp.sum(y_true.reshape(-1) * binarized_output.reshape(-1), axis=0)
    return -tp.mean()


def _objective_as_loss(objective):
    """Adapt an (output_array, target_array) objective to the engine's
    loss contract loss_fn(output_dict, target_dict). The reference registry
    returns F1_loss_objective with its raw-array signature (losses.py:
    13-17), which cannot actually be plugged into its own training loop;
    here every registered loss satisfies the contract."""

    def loss(output_dict: dict, target_dict: dict) -> Array:
        return objective(output_dict["clipwise_output"],
                         target_dict["target"].astype(jnp.float32))

    return loss


def get_loss_func(loss_type: str):
    if loss_type == "clip_bce":
        return clip_bce
    if loss_type == "f1micro":
        return _objective_as_loss(f1_loss_objective)
    if loss_type == "f1macro":
        return _objective_as_loss(macro_f1_loss_objective)
    if loss_type == "set_acc":
        return _objective_as_loss(set_acc_loss_objective)
    raise ValueError(f"unknown loss type {loss_type!r}")
