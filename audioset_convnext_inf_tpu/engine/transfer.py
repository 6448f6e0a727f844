"""Transfer learning: finetune a pretrained zoo model on a new tag task.

Functional rebuild of finetune_audiocaps.py's ``Transfer_Cnn`` (:74-128) +
training loop (:166-226): a pretrained Cnn14 base with everything frozen
except ``fc1`` and ``fc_audioset``, Adam(amsgrad) at 1e-4, BCE loss,
per-epoch val/test mAP.

Freezing is an optax mask (only the head subtrees receive updates) instead
of requires_grad mutation; the frozen trunk still runs under the same jit.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audioset_convnext_inf_tpu.engine.metrics import evaluate_clipwise
from audioset_convnext_inf_tpu.models.pann import PannModel

Params = Dict[str, Any]


def head_only_labels(params: Params, trainable_keys: Tuple[str, ...] = ("fc1", "fc_audioset")):
    """Pytree of 'train'/'freeze' labels for optax.multi_transform."""
    return {
        k: jax.tree_util.tree_map(lambda _: "train" if k in trainable_keys else "freeze", v)
        for k, v in params.items()
    }


def merge_bn_stats(params: Params, bn_updates: Dict[str, Params]) -> Params:
    """Write updated BN running stats (mean/var only) back into the params.

    The functional analog of torch's in-place buffer mutation: the reference
    keeps the frozen base in train mode during finetuning
    (finetune_audiocaps.py:186 ``model.train()``), so BatchNorm running stats
    keep adapting to the transfer data even though no trunk weight receives a
    gradient — and eval-mode forwards then normalize with stats that match
    the features the head was trained on. ``bn_updates`` is the
    dotted-path-keyed accumulator the PANN applies return.
    """
    out = dict(params)
    for path, stats in bn_updates.items():
        node, keys = out, path.split(".")
        for k in keys[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        leaf = keys[-1]
        node[leaf] = dict(node[leaf], mean=stats["mean"], var=stats["var"])
    return out


class TransferTrainer:
    def __init__(
        self,
        model: PannModel,
        learning_rate: float = 1e-4,
        trainable_keys: Tuple[str, ...] = ("fc1", "fc_audioset"),
        seed: int = 0,
    ):
        self.model = model
        labels = head_only_labels(model.params, trainable_keys)
        self.tx = optax.multi_transform(
            {
                "train": optax.amsgrad(learning_rate, b1=0.9, b2=0.999, eps=1e-8),
                "freeze": optax.set_to_zero(),
            },
            labels,
        )
        self.opt_state = self.tx.init(model.params)
        self._key = jax.random.PRNGKey(seed)
        self._step = 0

        cfg, frontend = model.cfg, model.frontend
        from audioset_convnext_inf_tpu.models import pann as pann_mod

        _, apply_fn = pann_mod._FAMILIES[cfg.family]

        def loss_fn(params, audio, tags, key):
            out = apply_fn(params, audio, cfg=cfg, frontend=frontend, train_key=key)
            loss = optax.sigmoid_binary_cross_entropy(out["clipwise_logits"], tags).mean()
            return loss, out.get("bn_updates", {})

        def train_step(params, opt_state, audio, tags, key):
            (loss, bn_updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, audio, tags, key
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            params = merge_bn_stats(params, bn_updates)
            return params, opt_state, loss

        self._train_step = jax.jit(train_step)

    def step(self, audio: np.ndarray, tags: np.ndarray) -> float:
        self._key, k = jax.random.split(self._key)
        params, self.opt_state, loss = self._train_step(
            self.model.params, self.opt_state,
            jnp.asarray(audio, jnp.float32), jnp.asarray(tags, jnp.float32), k,
        )
        self.model.params = params
        self._step += 1
        return float(loss)

    def evaluate(self, loader: Iterable) -> float:
        """Mean AP over a loader of {'audio', 'tags'} batches."""
        outs, tags = [], []
        for batch in loader:
            out = self.model.forward(np.asarray(batch["audio"], np.float32))
            outs.append(np.asarray(out["clipwise_output"]))
            tags.append(np.asarray(batch["tags"]))
        stats = evaluate_clipwise(np.concatenate(outs), np.concatenate(tags))
        return float(np.nanmean(stats["average_precision"]))

    def fit(
        self,
        train_loader_fn: Callable[[], Iterable],
        val_loader_fn: Optional[Callable[[], Iterable]] = None,
        test_loader_fn: Optional[Callable[[], Iterable]] = None,
        epochs: int = 19,
        log_interval: int = 100,
        checkpoint_fn: Optional[Callable[[int, float], None]] = None,
    ) -> List[float]:
        history = []
        for epoch in range(1, epochs + 1):
            for it, batch in enumerate(train_loader_fn()):
                loss = self.step(batch["audio"], batch["tags"])
                if it % log_interval == 0:
                    logging.info("epoch %d it %d loss %.5f", epoch, it, loss)
            # history/checkpoint naming record the VAL metric (model
            # selection must not key on the test set); test mAP is logged
            # only. Without a val loader, fall back to whatever ran.
            epoch_maps = {}
            for tag, fn in (("val", val_loader_fn), ("test", test_loader_fn)):
                if fn is None:
                    continue
                epoch_maps[tag] = self.evaluate(fn())
                logging.info("%s - epoch %d - mAP: %.4f", tag, epoch,
                             epoch_maps[tag])
            mAP = epoch_maps.get("val", epoch_maps.get("test", float("nan")))
            history.append(mAP)
            if checkpoint_fn is not None:
                checkpoint_fn(epoch, mAP)
        return history
