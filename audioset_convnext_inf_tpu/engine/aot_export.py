"""Ahead-of-time serving export: serialized StableHLO artifacts.

TPU-native deployment analog of the reference's checkpoint-distribution
story (convert_pytorch_ckpt_to_safetensors.py:11-19 ships weights; the
consumer still needs the full Python model code). Here the whole serving
program - frontend DFT/mel GEMMs, ConvNeXt trunk (including the fused
Pallas kernels when exported on TPU), sigmoid head - is lowered once with
``jax.export`` and serialized WITH the weights baked in as constants. A
server deserializes the artifact and calls it without importing any model
code, and the compile cost is paid at export time, not at first request.

Artifacts are per-(kind, batch-size): serving runs fixed-shape XLA
programs, so a bundle holds one program per batch bucket and the loader
pads each request up to the smallest bucket that fits (the standard
dynamic-batching contract, engine/service.py).

Layout of a bundle directory::

    manifest.json                     # shapes, dtype, platforms, params
    forward_b1.jaxexport              # jax.export serialization, one per
    forward_b32.jaxexport             # (kind, batch) pair
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jex

from audioset_convnext_inf_tpu.config import CLIP_SAMPLES

_KINDS = ("forward", "scene", "frame")
_MANIFEST = "manifest.json"


def _inner_fn(model, kind: str):
    if kind == "forward":
        return model._jit_forward
    if kind == "scene":
        return model._jit_scene
    if kind == "frame":
        return model._jit_frame
    raise ValueError(f"kind must be one of {_KINDS}, got {kind!r}")


def _serving_fn(model, kind: str):
    """Close the params over the pure forward so they serialize as
    constants; jit-of-jit inlines the model's cached jitted callables."""
    params = model.params
    inner = _inner_fn(model, kind)

    def fn(waveform):
        return inner(params, waveform)

    return fn


def _flatten_params(params) -> Dict[str, np.ndarray]:
    """Dotted-path -> leaf array. Handles the param tree's LIST nodes
    (``stages``, ``downsample``) as numeric path segments; a dict-only walk
    would np.asarray a list-of-dicts into an OBJECT array, which np.savez
    silently pickles and np.load(allow_pickle=False) then rejects."""
    from audioset_convnext_inf_tpu.models.convnext import _flatten_with_names

    return {".".join(path): np.asarray(leaf)
            for path, leaf in _flatten_with_names(params)}


def _unflatten_params(flat: Dict[str, np.ndarray]):
    """Inverse of :func:`_flatten_params`: all-digit key levels rebuild as
    lists (param trees never use digit strings as dict keys)."""
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        node, parts = tree, key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def fix(node):
        if isinstance(node, dict):
            if node and all(k.isdigit() for k in node):
                return [fix(node[k]) for k in sorted(node, key=int)]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(tree)


def export_serving(
    model,
    batch_size,
    *,
    kind: str = "forward",
    pcm: bool = False,
    num_samples: int = CLIP_SAMPLES,
    platforms: Optional[Sequence[str]] = None,
) -> jex.Exported:
    """Export one serving program.

    ``batch_size`` is an int (fixed-shape program - the serving default)
    or the string ``"dynamic"``: a symbolic-batch export whose single
    artifact accepts ANY batch size. Dynamic programs specialize (compile)
    per concrete batch at call time, so fixed buckets stay the right
    choice for a latency-sensitive server; dynamic is the overflow/offline
    path. The fused Pallas kernels tile over the batch dim and cannot
    lower with a symbolic batch - the %16 gate (models/convnext.py)
    resolves False for symbolic dims, so a dynamic program of the bf16
    serving config automatically takes the pure-XLA trunk.

    ``pcm=True`` exports the int16-PCM entry point (on-device ``x/32767``
    decode, halving ingest bandwidth - the serving path's native format).
    ``platforms`` defaults to the current backend; pass ``("tpu",)`` to
    build a TPU artifact from a CPU host.
    """
    dtype = jnp.int16 if pcm else jnp.float32
    if batch_size == "dynamic":
        (b,) = jex.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((b, num_samples), dtype)
    else:
        spec = jax.ShapeDtypeStruct((int(batch_size), num_samples), dtype)
    fn = jax.jit(_serving_fn(model, kind))
    return jex.export(fn, platforms=platforms)(spec)


def export_serving_shared(
    model,
    batch_size,
    *,
    kind: str = "forward",
    pcm: bool = False,
    num_samples: int = CLIP_SAMPLES,
    platforms: Optional[Sequence[str]] = None,
) -> jex.Exported:
    """Like :func:`export_serving` but the program takes ``(params,
    waveform)`` instead of baking the weights in as constants - so a
    bundle with many batch buckets stores the weights ONCE (params.npz)
    instead of duplicating ~113 MB into every program."""
    dtype = jnp.int16 if pcm else jnp.float32
    if batch_size == "dynamic":
        (b,) = jex.symbolic_shape("b")
        wav_spec = jax.ShapeDtypeStruct((b, num_samples), dtype)
    else:
        wav_spec = jax.ShapeDtypeStruct((int(batch_size), num_samples), dtype)
    params_spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        model.params)
    fn = jax.jit(_inner_fn(model, kind))
    return jex.export(fn, platforms=platforms)(params_spec, wav_spec)


def save_bundle(
    model,
    path: str,
    *,
    batch_sizes: Sequence[int] = (1, 16, 32, 128),
    kinds: Sequence[str] = ("forward",),
    pcm: bool = False,
    num_samples: int = CLIP_SAMPLES,
    platforms: Optional[Sequence[str]] = None,
    weights: str = "baked",
) -> Dict[str, Any]:
    """Export a serving bundle (one program per (kind, batch)) to ``path``.

    ``weights``: "baked" (default) embeds the params in every program -
    fully self-contained blobs; "shared" stores them once in params.npz
    and exports small parameterized programs (the right choice for many
    buckets/kinds).
    """
    if weights not in ("baked", "shared"):
        raise ValueError(f"weights must be 'baked' or 'shared', got {weights!r}")
    os.makedirs(path, exist_ok=True)
    dynamic = "dynamic" in batch_sizes
    fixed = sorted(set(int(b) for b in batch_sizes if b != "dynamic"))
    export_one = export_serving if weights == "baked" else export_serving_shared
    entries = {}
    for kind in kinds:
        for b in fixed + (["dynamic"] if dynamic else []):
            exp = export_one(model, b, kind=kind, pcm=pcm,
                             num_samples=num_samples, platforms=platforms)
            fname = f"{kind}_b{b}.jaxexport"
            with open(os.path.join(path, fname), "wb") as f:
                f.write(exp.serialize())
            entries[f"{kind}:{b}"] = fname
    if weights == "shared":
        np.savez(os.path.join(path, "params.npz"), **_flatten_params(model.params))
    manifest = {
        "format": "audioset_convnext_inf_tpu.aot_bundle.v1",
        "model": getattr(model.cfg, "name", "convnext"),
        "input_dtype": "int16" if pcm else "float32",
        "num_samples": int(num_samples),
        "batch_sizes": fixed,
        "dynamic": dynamic,
        "kinds": list(kinds),
        "weights": weights,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "param_count": int(model.count_parameters()),
        "jax_version": jax.__version__,
        "entries": entries,
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
        f.write("\n")
    return manifest


class ServingBundle:
    """Deserialized AOT bundle: pads each batch to the smallest exported
    bucket that fits, runs the fixed-shape program, slices the pad away.
    No model code or weights are needed - everything lives in the blobs."""

    def __init__(self, manifest: Dict[str, Any], programs: Dict[str, jex.Exported],
                 params=None):
        self.manifest = manifest
        self._programs = programs
        self._params = params  # only for weights="shared" bundles
        self._buckets = sorted(manifest["batch_sizes"])
        self._dynamic = bool(manifest.get("dynamic", False))
        self._dtype = jnp.int16 if manifest["input_dtype"] == "int16" else jnp.float32
        self._num_samples = int(manifest["num_samples"])

    def bucket_for(self, n: int):
        """Smallest fixed bucket that fits ``n``; the string ``"dynamic"``
        when only the symbolic-batch program can serve it (preferring
        precompiled fixed shapes - dynamic specializes per call shape)."""
        for b in self._buckets:
            if b >= n:
                return b
        if self._dynamic:
            return "dynamic"
        raise ValueError(
            f"batch {n} exceeds the largest exported bucket {self._buckets[-1]}")

    def __call__(self, waveform, kind: str = "forward"):
        wav = jnp.asarray(waveform)
        if wav.ndim != 2 or wav.shape[1] != self._num_samples:
            raise ValueError(
                f"expected (B, {self._num_samples}) input, got {wav.shape}")
        if wav.dtype != self._dtype:
            raise ValueError(
                f"bundle expects {np.dtype(self._dtype.dtype).name} input, "
                f"got {wav.dtype}")
        n = wav.shape[0]
        b = self.bucket_for(n)
        if f"{kind}:{b}" not in self._programs:
            raise ValueError(f"bundle has no {kind!r} programs "
                             f"(kinds: {self.manifest['kinds']})")
        if b != "dynamic" and b != n:
            wav = jnp.pad(wav, ((0, b - n), (0, 0)))
        program = self._programs[f"{kind}:{b}"]
        out = (program.call(self._params, wav) if self._params is not None
               else program.call(wav))
        return jax.tree_util.tree_map(lambda x: x[:n], out)


class BundleModel:
    """Adapts a :class:`ServingBundle` to the live-model surface the
    serving stack expects (``forward`` / ``forward_scene_embeddings``),
    so ``engine/service.py`` and ``cli/serve.py`` can serve straight from
    an AOT bundle with no model code or weights on the box.

    Inputs convert to the bundle's wire dtype: float audio quantizes to
    int16 PCM for a pcm bundle (that IS the serving wire format; for
    samples already on the int16 grid the on-device /32767 decode recovers
    them exactly, while arbitrary float32 audio is quantized to the 16-bit
    wire grid with per-sample error bounded by 0.5/32767 ~ 1.5e-5 - expect
    that delta when comparing pcm vs float bundles), and int16 decodes to
    float32 for a float bundle (reference utilities.py:226 convention).
    """

    def __init__(self, bundle: ServingBundle):
        self.bundle = bundle

    @property
    def max_batch(self) -> Optional[int]:
        """Largest fixed bucket; None when a dynamic program serves any
        batch (no cap)."""
        if self.bundle._dynamic:
            return None
        return self.bundle._buckets[-1]

    def _adapt(self, waveform) -> np.ndarray:
        wav = np.asarray(waveform)
        if self.bundle._dtype == jnp.int16 and wav.dtype != np.int16:
            wav = np.clip(np.round(wav.astype(np.float64) * 32767.0),
                          -32768, 32767).astype(np.int16)
        elif self.bundle._dtype != jnp.int16 and wav.dtype == np.int16:
            from audioset_convnext_inf_tpu.config import INT16_SCALE

            wav = wav.astype(np.float32) * np.float32(INT16_SCALE)
        return wav

    def forward(self, waveform):
        return self.bundle(self._adapt(waveform))

    def forward_scene_embeddings(self, waveform):
        return self.bundle(self._adapt(waveform), kind="scene")


def load_bundle(path: str) -> ServingBundle:
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != "audioset_convnext_inf_tpu.aot_bundle.v1":
        raise ValueError(f"not an AOT serving bundle: {path}")
    programs = {}
    for key, fname in manifest["entries"].items():
        with open(os.path.join(path, fname), "rb") as f:
            programs[key] = jex.deserialize(bytearray(f.read()))
    params = None
    if manifest.get("weights") == "shared":
        with np.load(os.path.join(path, "params.npz")) as flat:
            params = _unflatten_params({k: flat[k] for k in flat.files})
    return ServingBundle(manifest, programs, params=params)
