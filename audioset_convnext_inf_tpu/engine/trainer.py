"""Data-parallel training engine.

TPU-native rebuild of the reference DDP train loop (main.py:117-923):

 - one jit-compiled ``train_step`` with the batch sharded over the mesh's
   ``data`` axis and parameters replicated - XLA inserts the gradient
   all-reduce the way DDP's NCCL hook did, but fused into the backward;
 - optax AdamW with the reference's custom weight-decay grouping (no decay
   for 1-D params / biases, pytorch_utils.custom_weight_decay:39-53),
   OneCycle LR over 75k steps (main.py:659-660), optional Adam;
 - gradient accumulation via optax.MultiSteps (the reference *advertises*
   ``accumulation_steps`` but never implements it - main.py:134,883);
 - mixup (paired 2B batch), SpecAugment and DropPath under one PRNG key per
   step; bn0 running stats updated functionally;
 - checkpoint every N iterations incl. optimizer/sampler state; resume
   restores the exact data order (main.py:621-634,714-717).
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audioset_convnext_inf_tpu.config import ConvNeXtConfig
from audioset_convnext_inf_tpu.engine.losses import clip_bce
from audioset_convnext_inf_tpu.models import convnext as F
from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend
from audioset_convnext_inf_tpu.ops.mixup import do_mixup, get_mixup_lambda
from audioset_convnext_inf_tpu.parallel.mesh import batch_sharding, get_mesh

Params = Dict[str, Any]


@dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "adamw"  # "adam" | "adamw" (main.py:645-658)
    max_lr: float = 4e-4
    total_steps: int = 75000  # OneCycleLR span (main.py:659-660)
    pct_start: float = 0.3
    div_factor: float = 25.0
    final_div_factor: float = 1e4
    weight_decay: float = 0.01
    # Optional WD schedule (reference main.py:664-712): cooldown phase
    # (constant or cosine from wd to wd/5) for the first 30% of steps, then
    # linear warmup to 2*wd.
    use_wd_schedule: bool = False
    wd_constant_cooldown: bool = True
    wd_cooldown_frac: float = 0.3
    accumulation_steps: int = 1
    mixup_alpha: float = 0.0  # 0 disables; reference uses 1.0 when on
    seed: int = 1234
    bf16_compute: bool = False


def _wd_mask(params: Params):
    """True = apply weight decay. Mirrors custom_weight_decay: no decay for
    rank-1 tensors (biases, norm scales, gamma) - everything else decays."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def onecycle_lr(cfg: TrainConfig) -> optax.Schedule:
    """Cosine one-cycle (torch OneCycleLR default shape)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=cfg.total_steps,
        peak_value=cfg.max_lr,
        pct_start=cfg.pct_start,
        div_factor=cfg.div_factor,
        final_div_factor=cfg.final_div_factor,
    )


def wd_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Cooldown (constant or cosine wd->wd/5) then linear warmup to 2*wd
    over total_steps (reference wd_scheduler, main.py:667-708)."""
    base, final, minv = cfg.weight_decay, 2 * cfg.weight_decay, cfg.weight_decay / 5
    cooldown = int(cfg.wd_cooldown_frac * cfg.total_steps)

    def sched(step):
        step = jnp.asarray(step)
        if cfg.wd_constant_cooldown:
            cool = base
        else:
            cool = minv + 0.5 * (base - minv) * (1 + jnp.cos(jnp.pi * step / max(cooldown, 1)))
        start = base if cfg.wd_constant_cooldown else minv
        frac = (step - cooldown) / max(cfg.total_steps - cooldown - 1, 1)
        warm = start + (final - start) * jnp.clip(frac, 0.0, 1.0)
        return jnp.where(step < cooldown, cool, warm)

    return sched


def make_optimizer(params: Params, cfg: TrainConfig) -> optax.GradientTransformation:
    lr = onecycle_lr(cfg)
    if cfg.optimizer == "adamw":
        mask = _wd_mask(params)
        if cfg.use_wd_schedule:
            tx = optax.inject_hyperparams(
                optax.adamw, static_args=("b1", "b2", "eps", "mask")
            )(
                learning_rate=lr,
                weight_decay=wd_schedule(cfg),
                b1=0.9,
                b2=0.999,
                eps=1e-8,
                mask=mask,
            )
        else:
            tx = optax.adamw(
                lr, b1=0.9, b2=0.999, eps=1e-8,
                weight_decay=cfg.weight_decay, mask=mask,
            )
    elif cfg.optimizer == "adam":
        tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    # bn0 running mean/var receive zero gradient (train mode normalizes with
    # batch statistics), so Adam leaves them untouched; the train step then
    # overwrites them functionally. bn0 scale/bias train normally.
    if cfg.accumulation_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulation_steps)
    return tx


@dataclass
class TrainState:
    params: Params
    opt_state: Any
    step: int


def make_train_step(
    model_cfg: ConvNeXtConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    loss_fn: Callable = clip_bce,
):
    """Build the jit-compiled, mesh-sharded train step.

    Signature: step(params, opt_state, waveform, target, step_idx, key)
        -> (params, opt_state, loss)
    With mixup enabled the incoming batch is 2B and the effective batch B.
    """
    mesh = mesh if mesh is not None else get_mesh()
    compute_dtype = jnp.bfloat16 if train_cfg.bf16_compute else jnp.float32
    frontend = LogMelFrontend(model_cfg.frontend, compute_dtype=compute_dtype)
    use_mixup = train_cfg.mixup_alpha > 0
    # GSPMD has no partitioning rule for the Mosaic custom calls the fused
    # training blocks lower to, so on a multi-device mesh the trunk must run
    # under shard_map (each device executes the kernels on its local batch
    # shard) - the same treatment the sharded Evaluator gives the fused eval
    # kernels. The prologue (waveform augs, frontend, bn0 batch stats,
    # SpecAugment, mixup) stays global: it is pure XLA, and bn0's batch
    # statistics then reduce over the GLOBAL batch exactly like the
    # unsharded path.
    use_shard_map = mesh.size > 1 and model_cfg.fused_train_blocks

    def loss_and_aux(params, waveform, target, key):
        mix_key, fwd_key = jax.random.split(key)
        mixup_lambda = None
        if use_mixup:
            mixup_lambda = get_mixup_lambda(mix_key, waveform.shape[0], train_cfg.mixup_alpha)
            target = do_mixup(target, mixup_lambda)
        out, new_bn = F.forward_train(
            params, waveform, model_cfg, fwd_key,
            mixup_lambda=mixup_lambda, frontend=frontend, compute_dtype=compute_dtype,
        )
        loss = loss_fn(out, {"target": target})
        return loss, new_bn

    if use_shard_map:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from audioset_convnext_inf_tpu.models import layers as L

        def _trunk_loss(params, x, target, dp_key):
            # Per-shard drop-path stream (fold_in by device index) - faithful
            # to the reference's per-rank DDP seeds (main.py:413). Everything
            # batch-coupled (augs, bn0 stats, SpecAugment, mixup) was already
            # applied globally upstream of the shard_map boundary.
            local_key = jax.random.fold_in(dp_key, jax.lax.axis_index("data"))
            emb = F.forward_features(x, params, model_cfg, train_key=local_key)
            logits = L.linear(
                emb, params["head"]["w"], params["head"]["b"]
            ).astype(jnp.float32)
            out = {"clipwise_output": jax.nn.sigmoid(logits),
                   "clipwise_logits": logits}
            # equal shard sizes => pmean of local means == global mean; the
            # psum also gives shard_map's AD the transpose it needs to
            # all-reduce the parameter gradients (DDP semantics)
            return jax.lax.pmean(loss_fn(out, {"target": target}), "data")

        _trunk_loss = shard_map(
            _trunk_loss, mesh=mesh,
            in_specs=(P(), P("data"), P("data"), P()),
            out_specs=P(), check_vma=False,
        )

        def loss_and_aux(params, waveform, target, key):  # noqa: F811
            mix_key, fwd_key = jax.random.split(key)
            mixup_lambda = None
            if use_mixup:
                mixup_lambda = get_mixup_lambda(
                    mix_key, waveform.shape[0], train_cfg.mixup_alpha
                )
                target = do_mixup(target, mixup_lambda)
            # mirror forward_train's internal key split so the global
            # augment/SpecAugment draws match the unsharded path bit-for-bit
            _, aug_key, dp_key = jax.random.split(fwd_key, 3)
            x, new_bn = F._frontend_and_bn0(
                waveform, params, model_cfg, frontend, True, aug_key,
                mixup_lambda, compute_dtype,
            )
            loss = _trunk_loss(params, x, target, dp_key)
            return loss, new_bn

    def train_step(params, opt_state, waveform, target, step_idx, key):
        # on-device int16 PCM decode (ops/pcm.py; dtype is static under
        # jit). Same f32 multiply-by-constant as the host decode, so int16-
        # ingested training is BIT-IDENTICAL to f32 ingest while shipping
        # half the bytes (tests/test_trainer.py).
        from audioset_convnext_inf_tpu.ops.pcm import decode_pcm_if_int16

        waveform = decode_pcm_if_int16(waveform)
        step_key = jax.random.fold_in(key, step_idx)
        (loss, new_bn), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(
            params, waveform, target, step_key
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # bn0 running stats: functional update. Only mean/var come from the
        # batch-stat pass - scale/bias ARE trainable (they affect the loss
        # through the batch-stat normalization) and must keep the optimizer
        # update rather than being clobbered with their pre-step values.
        params = dict(
            params,
            bn0=dict(params["bn0"], mean=new_bn["mean"], var=new_bn["var"]),
        )
        return params, opt_state, loss

    # NOTE: shardings are carried by the *inputs* (device_put in
    # Trainer.step / init), not by jit in_shardings - explicit in_shardings
    # takes a ~60x slower execution path through the remote-relay backend,
    # and input-propagated shardings are equivalent for this layout.
    return jax.jit(train_step)


class Trainer:
    """Orchestrates the loop: steps, periodic eval, checkpointing, resume."""

    def __init__(
        self,
        model_cfg: ConvNeXtConfig,
        train_cfg: TrainConfig,
        params: Params,
        mesh=None,
        loss_fn: Callable = clip_bce,
    ):
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.mesh = mesh if mesh is not None else get_mesh()
        self.tx = make_optimizer(params, train_cfg)
        if self.mesh.size > 1:
            # replicate params across the mesh so XLA sees a fully-specified
            # layout from the inputs (batch arrives data-sharded)
            from audioset_convnext_inf_tpu.parallel.mesh import replicate

            params = jax.device_put(params, replicate(self.mesh))
        self.state = TrainState(params=params, opt_state=self.tx.init(params), step=0)
        self._step_fn = make_train_step(model_cfg, train_cfg, self.tx, self.mesh, loss_fn)
        self._key = jax.random.PRNGKey(train_cfg.seed)
        self._sharding = batch_sharding(self.mesh)
        # sampler snapshot of the last consumed batch (set by train(); the
        # loader runs the sampler ahead, so this - not the live sampler - is
        # what a checkpoint must save for exact resume)
        self.last_sampler_state = None

    def restore(self, params: Params, opt_state, step: int) -> None:
        """Adopt restored state with the constructor's device placement.

        Checkpoints come back as host arrays; assigning them to
        ``self.state`` directly would feed differently-placed params to the
        compiled step (recompile + implicit transfers on a multi-chip mesh).
        """
        params = jax.tree_util.tree_map(jnp.asarray, params)
        opt_state = jax.tree_util.tree_map(jnp.asarray, opt_state)
        if self.mesh.size > 1:
            from audioset_convnext_inf_tpu.parallel.mesh import replicate

            params = jax.device_put(params, replicate(self.mesh))
            opt_state = jax.device_put(opt_state, replicate(self.mesh))
        self.state = TrainState(params=params, opt_state=opt_state, step=step)

    def step_async(self, waveform: np.ndarray, target: np.ndarray):
        """Dispatch one step; return the loss as a DEVICE scalar (no sync).

        The returned ``jax.Array`` keeps the dispatch queue full - fetching
        it (``float()``) is the caller's sync point. Through the remote
        relay a per-step scalar fetch costs ~4 s (NOTES.md traps), so the
        loop below syncs only at ``log_interval`` boundaries.
        """
        wav_np = np.asarray(waveform)
        if wav_np.dtype != np.int16:  # int16 PCM ships raw; device decodes
            wav_np = wav_np.astype(np.float32)
        wav = jax.device_put(wav_np, self._sharding)
        tgt = jax.device_put(np.asarray(target, np.float32), self._sharding)
        params, opt_state, loss = self._step_fn(
            self.state.params, self.state.opt_state, wav, tgt, self.state.step, self._key
        )
        self.state = TrainState(params=params, opt_state=opt_state, step=self.state.step + 1)
        return loss

    def step(self, waveform: np.ndarray, target: np.ndarray) -> float:
        return float(self.step_async(waveform, target))

    def train(
        self,
        train_loader: Iterable,
        eval_fn: Optional[Callable[[Params, int], None]] = None,
        eval_interval: int = 5000,
        checkpoint_fn: Optional[Callable[["Trainer", int], None]] = None,
        checkpoint_interval: int = 5000,
        early_stop: Optional[int] = None,
        log_interval: int = 100,
        on_step: Optional[Callable[[int, float], None]] = None,
        max_step_retries: int = 2,
    ) -> None:
        """Run the loop. Failure handling (SURVEY.md section 5.3 - the
        reference has none beyond manual restart):

        - a DISPATCH-time error (bad shapes, host OOM, tracer error) retries
          the same batch up to ``max_step_retries`` times, then attempts an
          emergency checkpoint (pre-step state, still valid) and re-raises;
        - a DEVICE-side execution error surfaces at the next sync point
          (``log_interval`` boundary, or ``on_step``'s host-float fetch).
          By then up to ``log_interval`` further steps were dispatched on
          top of the failed one, so the live state is NOT checkpointable -
          the loop logs that recovery is from the last interval checkpoint
          and re-raises; it does not pretend to save a rescue point.
        - a non-finite loss (deterministic - retrying cannot help) is
          logged loudly and training continues, as the reference does.

        ``on_step`` receives a host float, which forces a per-step device
        sync - through a remote relay that costs ~4 s/step (NOTES.md), so
        leave it unset for throughput runs and read the log lines instead.
        """
        t0 = time.time()
        loss = None

        def sync_loss(loss, it: int) -> float:
            """Fetch the step loss; a deferred device error lands here."""
            try:
                return float(loss)
            except Exception:
                # the failed step is 1..log_interval dispatches behind the
                # live state: params/opt_state are poisoned device arrays,
                # so there is nothing valid left to checkpoint
                logging.exception(
                    "deferred device error surfaced at iter %d; live state is "
                    "unrecoverable - resume from the last interval checkpoint",
                    it)
                raise

        for batch in train_loader:
            it = self.state.step
            # `batch` was already drawn from the (prefetching) loader, so a
            # checkpoint taken HERE must carry the sampler snapshot of the
            # previous batch - on resume the loader regenerates this one
            # interval 0 (or None fn) disables the hook entirely
            if eval_interval and it % eval_interval == 0 and eval_fn is not None and it > 0:
                eval_fn(self.state.params, it)
            if checkpoint_interval and it % checkpoint_interval == 0 \
                    and checkpoint_fn is not None and it > 0:
                checkpoint_fn(self, it)
            for attempt in range(max_step_retries + 1):
                try:
                    # async dispatch: the loss stays on device and the queue
                    # stays full; we sync (and surface deferred device
                    # errors / non-finite losses) at log_interval boundaries
                    loss = self.step_async(batch["waveform"], batch["target"])
                    break
                except Exception:
                    if attempt >= max_step_retries:
                        logging.exception("train step failed to dispatch at "
                                          "iter %d; writing emergency "
                                          "checkpoint", it)
                        if checkpoint_fn is not None:
                            try:  # pre-step state; may itself be poisoned
                                checkpoint_fn(self, it)
                            except Exception:
                                logging.exception(
                                    "emergency checkpoint failed at iter %d; "
                                    "resume from the last interval checkpoint",
                                    it)
                        raise
                    logging.exception("train step error at iter %d, retrying", it)
            self.last_sampler_state = batch.get("sampler_state")
            if on_step is not None:
                on_step(it, sync_loss(loss, it))  # contract: a host float
            if it % log_interval == 0:
                lossf = sync_loss(loss, it)
                if not np.isfinite(lossf):
                    # deterministic (params already poisoned persist to the
                    # next window) - surface loudly, as the reference does
                    logging.warning("non-finite loss %.4f at iter %d", lossf, it)
                logging.info(
                    "iteration %d loss %.4f (%.2f s)", it, lossf, time.time() - t0
                )
                t0 = time.time()
            if early_stop is not None and self.state.step >= early_stop:
                break
        # final sync: with async dispatch, the trailing < log_interval steps
        # never hit a sync point - surface their deferred device errors /
        # non-finite losses before reporting success
        if loss is not None:
            lossf = sync_loss(loss, self.state.step - 1)
            if not np.isfinite(lossf):
                logging.warning(
                    "non-finite loss %.4f at final iter %d",
                    lossf, self.state.step - 1)
