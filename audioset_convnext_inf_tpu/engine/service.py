"""Dynamic-batching inference service.

The serving-side counterpart of BASELINE.json's "high-throughput streaming
tagging + embedding service" config: callers submit single clips from any
thread; a collector thread coalesces them into fixed-shape batches (padding
the tail) so the device always runs the one compiled program, and results
are fanned back out through futures.

Design: one queue -> one batcher thread -> jit forward. Batches close when
``batch_size`` requests are waiting or ``max_wait_ms`` elapses, whichever
comes first - latency-bounded dynamic batching. Long audio is windowed into
extra batch rows upstream (engine/infer.py::sliding_windows).

The batcher is double-buffered: jax dispatch is async, so the worker
launches batch N on the device and only then fans batch N-1's results out
of its futures - the device computes while the host fetches/distributes
the previous results, instead of idling through every D2H.
"""

from __future__ import annotations

import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from typing import Dict, List, Optional

import numpy as np

from audioset_convnext_inf_tpu.config import CLIP_SAMPLES, INT16_SCALE


class ServiceOverloaded(RuntimeError):
    """The request queue is full (``max_queued``); shed load upstream."""


class ServiceStopped(RuntimeError):
    """The service was stopped before this request could be served."""


class ShardedModel:
    """Mesh-sharded serving forward with the live-model call contract.

    BASELINE.json config 5 (streaming tagging + embedding service on a
    v5e-8) shards each coalesced batch across the device mesh instead of
    running it on one chip. Wraps a :class:`~...models.api.ConvNeXt`:
    params replicate over the mesh once; each ``forward`` device_puts the
    batch with the leading dim sharded over the 1-D ``data`` axis and runs
    the forward under ``shard_map`` - per-device whole-model execution, so
    the fused Pallas stage kernels (for which GSPMD has no partitioning
    rule) run on local shards, exactly the engine/evaluator.py recipe.
    There are no collectives inside: serving is per-clip independent.

    Drop-in for :class:`InferenceService`'s ``model`` (same dict outputs,
    ``forward_scene_embeddings`` for the /embed endpoint). Batches whose
    length doesn't divide the mesh are zero-padded and trimmed, so any
    ``batch_size`` works - but the fused Pallas serving kernels gate on
    the PER-DEVICE batch being a multiple of 16, so a service in the
    certified fast configuration needs ``batch_size % (16 * mesh.size)
    == 0`` (cli/serve.py --mesh rounds up automatically); anything
    smaller still runs correctly through the unfused XLA trunk.
    """

    def __init__(self, model, mesh=None):
        import jax
        import jax.numpy as jnp
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from audioset_convnext_inf_tpu.models import convnext as F
        from audioset_convnext_inf_tpu.parallel.mesh import (
            batch_sharding,
            get_mesh,
            replicate,
        )

        self.mesh = mesh if mesh is not None else get_mesh()
        cfg, frontend = model.cfg, model.frontend
        compute_dtype = model.compute_dtype

        def _call(fn):
            def wrapped(params, waveform):
                from audioset_convnext_inf_tpu.ops.pcm import decode_pcm_if_int16

                waveform = decode_pcm_if_int16(waveform)
                return fn(params, waveform, cfg=cfg, frontend=frontend,
                          compute_dtype=compute_dtype)
            if self.mesh.size > 1:
                wrapped = shard_map(
                    wrapped, mesh=self.mesh,
                    in_specs=(P(), P("data")), out_specs=P("data"),
                    check_vma=False,
                )
            return jax.jit(wrapped)

        self._fwd = _call(F.forward)
        self._scene = _call(F.forward_scene_embeddings)
        self._sharding = batch_sharding(self.mesh)
        self.params = jax.device_put(model.params, replicate(self.mesh))

    def _put(self, waveform):
        import jax

        from audioset_convnext_inf_tpu.parallel.mesh import pad_batch_to_multiple

        batch, n = pad_batch_to_multiple(
            {"waveform": np.asarray(waveform)}, self.mesh.size)
        return jax.device_put(batch["waveform"], self._sharding), n

    def forward(self, waveform) -> Dict[str, np.ndarray]:
        x, n = self._put(waveform)
        out = self._fwd(self.params, x)
        if n != x.shape[0]:
            out = {k: v[:n] for k, v in out.items()}
        return out

    def forward_scene_embeddings(self, waveform):
        x, n = self._put(waveform)
        return self._scene(self.params, x)[:n]


class InferenceService:
    def __init__(
        self,
        model,
        batch_size: int = 32,
        max_wait_ms: float = 20.0,
        clip_samples: int = CLIP_SAMPLES,
        pcm_int16: bool = False,
        max_queued: Optional[int] = None,
    ):
        """``max_queued`` bounds the request queue (backpressure): when
        full, ``submit`` raises :class:`ServiceOverloaded` instead of
        letting an unbounded flood of decoded clips eat host memory
        (callers map it to HTTP 429). Default: 32 batches' worth."""
        self.model = model
        self.batch_size = batch_size
        self.max_wait_ms = max_wait_ms
        self.clip_samples = clip_samples
        self.pcm_int16 = pcm_int16
        self.max_queued = 32 * batch_size if max_queued is None else max_queued
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.max_queued)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False
        # counters are read-modify-write from client threads (requests/
        # rejected) AND the worker (batches/clips) - guard with a lock so
        # /healthz numbers don't drop updates under concurrency
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "batches": 0, "clips": 0}
        # reusable batch slabs (worker-thread only): batch assembly used to
        # np.stack a fresh (batch, clip_samples) array per batch - at
        # batch=64 that's a 40-80 MB alloc + page-fault + copy PER BATCH
        # and was the dominant batcher cost. Two rotating buffers per wire
        # dtype are enough: forward() transfers the host buffer to the
        # device synchronously at call time, so a slab is dead the moment
        # _dispatch returns; the second slab only guards model doubles.
        self._slabs: Dict = {}  # np.dtype -> [buf, buf]
        self._slab_idx = 0

    # -- lifecycle -----------------------------------------------------------
    def start(self) -> "InferenceService":
        if not self._started:
            self._warmup()
            self._thread.start()
            self._started = True
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._started:
            self._thread.join(timeout=10)
        # fail queued-but-never-dispatched requests immediately: without
        # this their futures stay pending forever and callers block for
        # their full result() timeout (submit() also rejects once stopped)
        while True:
            try:
                _, fut = self._queue.get_nowait()
            except queue.Empty:
                break
            if not fut.done():
                try:
                    fut.set_exception(ServiceStopped("service stopped"))
                except Exception:  # lost a set race with submit(): done
                    pass

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    def _warmup(self) -> None:
        # compile the entry dtypes up front so no first request eats the
        # compile; int16-PCM batches are opt-in (pcm_int16=True) since the
        # all-int16 batch shape is its own compiled program
        self.model.forward(np.zeros((self.batch_size, self.clip_samples), np.float32))
        if self.pcm_int16:
            self.model.forward(np.zeros((self.batch_size, self.clip_samples), np.int16))

    # -- API -----------------------------------------------------------------
    def submit(self, waveform: np.ndarray) -> Future:
        """Queue one clip (any length; padded/cropped to clip_samples).
        Returns a Future resolving to {'clipwise_output', 'clipwise_logits'}.

        With ``pcm_int16=True``, int16 PCM clips stay int16 through the
        batcher and decode on the device inside the jitted forward
        (models/api.py) - half the host->device bytes of float32. Without
        it, int16 promotes here on the host: the int16 batch shape was
        never warmed, and an un-warmed all-int16 batch would stall the
        single worker thread on a full jit compile. Anything else converts
        to float32.

        float32 input is submitted ZERO-COPY (the batcher copies it into
        the batch slab at dispatch, within ``max_wait_ms``); callers must
        not mutate a submitted array before its future resolves."""
        wav = np.asarray(waveform)
        if wav.dtype == np.int16 and not self.pcm_int16:
            wav = wav.astype(np.float32) * np.float32(INT16_SCALE)
        elif wav.dtype != np.int16 and wav.dtype != np.float32:
            wav = wav.astype(np.float32)
        wav = wav.reshape(-1)
        if len(wav) < self.clip_samples:
            wav = np.pad(wav, (0, self.clip_samples - len(wav)))
        else:
            wav = wav[: self.clip_samples]
        if self._stop.is_set():
            raise ServiceStopped("service stopped")
        fut: Future = Future()
        try:
            self._queue.put_nowait((wav, fut))
        except queue.Full:
            with self._stats_lock:
                self.stats["rejected"] = self.stats.get("rejected", 0) + 1
            raise ServiceOverloaded(
                f"request queue full ({self.max_queued} clips queued)"
            ) from None
        if self._stop.is_set():
            # raced with stop(): the worker may already have exited and the
            # drain may have missed this entry - fail it here (first setter
            # wins; the drain checks done() before setting)
            try:
                fut.set_exception(ServiceStopped("service stopped"))
            except Exception:
                pass
            raise ServiceStopped("service stopped")
        with self._stats_lock:
            self.stats["requests"] += 1
        return fut

    def tag(self, waveform: np.ndarray, timeout: Optional[float] = 60.0) -> Dict[str, np.ndarray]:
        return self.submit(waveform).result(timeout=timeout)

    # -- batcher --------------------------------------------------------------
    def _worker(self) -> None:
        # one batch in flight on the device while the previous batch's
        # results fetch/fan out on the host (double buffering)
        pending: deque = deque()
        while not self._stop.is_set():
            try:
                # with results waiting, poll briefly so an idle queue doesn't
                # hold batch N's futures hostage until batch N+1 arrives
                first = self._queue.get(timeout=0.002 if pending else 0.1)
            except queue.Empty:
                if pending:
                    self._resolve(*pending.popleft())
                continue
            batch: List = [first]
            deadline = time.perf_counter() + self.max_wait_ms / 1000.0
            while len(batch) < self.batch_size:
                try:  # hot path: gulp whatever is already queued, no waits
                    batch.append(self._queue.get_nowait())
                    continue
                except queue.Empty:
                    pass
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._queue.get(timeout=remaining))
                except queue.Empty:
                    break
            out = self._dispatch(batch)
            if out is not None:
                pending.append((out, batch))
            while len(pending) > 1:
                self._resolve(*pending.popleft())
        while pending:  # drain on stop
            self._resolve(*pending.popleft())

    def _dispatch(self, batch: List):
        """Launch one batch on the device; returns device arrays (async)."""
        n = len(batch)
        # assemble into a reusable slab: row assignment is a GIL-released
        # memcpy (int16 rows in a float32 batch cast + scale in place)
        dtype = (np.int16 if all(b[0].dtype == np.int16 for b in batch)
                 else np.float32)
        slabs = self._slabs.setdefault(dtype, [None, None])
        self._slab_idx ^= 1
        wavs = slabs[self._slab_idx]
        if wavs is None:
            wavs = slabs[self._slab_idx] = np.zeros(
                (self.batch_size, self.clip_samples), dtype)
        for i, (w, _) in enumerate(batch):
            wavs[i] = w
            if w.dtype == np.int16 and dtype == np.float32:
                wavs[i] *= np.float32(INT16_SCALE)
        if n < self.batch_size:  # fixed shape -> single compiled program
            wavs[n:] = 0
        try:
            return self.model.forward(wavs)
        except Exception as e:  # dispatch failed: fail fast, keep serving
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
            with self._stats_lock:
                self.stats["batches"] += 1
                self.stats["clips"] += n
            return None

    def _resolve(self, out, batch: List) -> None:
        """Fetch one finished batch to host and fulfil its futures."""
        try:
            probs = np.asarray(out["clipwise_output"])
            logits = np.asarray(out["clipwise_logits"])
            for i, (_, fut) in enumerate(batch):
                fut.set_result(
                    {"clipwise_output": probs[i], "clipwise_logits": logits[i]}
                )
        except Exception as e:  # deferred device error surfaces at fetch
            for _, fut in batch:
                if not fut.done():
                    fut.set_exception(e)
        with self._stats_lock:
            self.stats["batches"] += 1
            self.stats["clips"] += len(batch)
