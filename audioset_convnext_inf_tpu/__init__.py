"""TPU-native AudioSet ConvNeXt audio-tagging framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``topel/audioset-convnext-inf`` (reference mounted at ``/root/reference``):
10-second 32 kHz waveforms -> log-mel spectrograms -> ConvNeXt trunk ->
527-class AudioSet logits / sigmoid probabilities, 768-d scene embeddings
and 768x31x7 frame embeddings.

Everything on the compute path is functional JAX: parameters are plain
pytrees, forward passes are pure jittable functions, multi-device execution
goes through ``jax.sharding.Mesh`` + NamedSharding (no NCCL/DDP-style
wrappers). The host-side runtime (HDF5 IO, samplers, prefetch) feeds the
device asynchronously with double-buffered ``jax.device_put``.

Public API (mirrors the reference entry points, see SURVEY.md section 2):

- :func:`audioset_convnext_inf_tpu.models.convnext_tiny` et al. - model factories
- :class:`audioset_convnext_inf_tpu.models.ConvNeXt` - bundled params+config
  with ``forward`` / ``forward_scene_embeddings`` / ``forward_frame_embeddings``
  / ``from_pretrained``
- :mod:`audioset_convnext_inf_tpu.checkpoint` - torch ``.pth``/safetensors ->
  JAX pytree conversion and native checkpoint IO
- :mod:`audioset_convnext_inf_tpu.engine` - batched evaluator (mAP/AUC/d'),
  trainer, tagging / embedding extraction, long-audio sliding window
- :mod:`audioset_convnext_inf_tpu.data` - HDF5 datasets, samplers with
  state_dict resume, async prefetching loader
- :mod:`audioset_convnext_inf_tpu.parallel` - device mesh helpers and
  sharded train/eval steps
"""

from audioset_convnext_inf_tpu.version import __version__


def __getattr__(name):
    """Lazy top-level API (avoids importing jax for metadata access)."""
    if name in ("ConvNeXt", "convnext_tiny", "convnext_nano", "convnext_atto",
                "convnext_femto", "convnext_pico", "convnext_small",
                "convnext_base", "create_model", "MODEL_REGISTRY",
                "PannModel", "create_pann_model", "PANN_REGISTRY"):
        import audioset_convnext_inf_tpu.models as models

        return getattr(models, name)
    if name in ("ConvNeXtConfig", "FrontendConfig", "AugmentConfig"):
        import audioset_convnext_inf_tpu.config as config

        return getattr(config, name)
    if name == "read_audioset_label_tags":
        from audioset_convnext_inf_tpu.labels import read_audioset_label_tags

        return read_audioset_label_tags
    raise AttributeError(name)


__all__ = [
    "__version__",
    "ConvNeXt",
    "convnext_tiny",
    "create_model",
    "create_pann_model",
    "ConvNeXtConfig",
    "read_audioset_label_tags",
]
