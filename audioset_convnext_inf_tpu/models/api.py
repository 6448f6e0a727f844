"""User-facing model API: factories + a bundled params/config object.

The compute path stays purely functional (models/convnext.py); this module
adds the ergonomic layer that mirrors the reference's entry points:

 - factories ``convnext_{atto,femto,pico,nano,tiny,small,base}``
   (reference convnext.py:569-901) returning a :class:`ConvNeXt` bundle
 - ``ConvNeXt.forward`` / ``forward_scene_embeddings`` /
   ``forward_frame_embeddings`` (reference convnext.py:287,333,369)
 - ``ConvNeXt.from_pretrained`` resolving local / URL / HF-hub checkpoints
   (reference convnext.py:404-511) through the checkpoint converter.

Note: the reference's convnext_small/base factories only swap in the audio
stem under ``pretrained=True`` and build the base stem with 96 channels
against dims[0]=128 (convnext.py:730-801) - latent shape bugs. Here every
factory installs a correct audio stem with dims[0] output channels.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from audioset_convnext_inf_tpu.config import AugmentConfig, ConvNeXtConfig
from audioset_convnext_inf_tpu.models import convnext as F
from audioset_convnext_inf_tpu.ops.frontend import LogMelFrontend

Params = Dict[str, Any]


class ConvNeXt:
    """Bundle of (config, params, frontend) with reference-shaped methods.

    All methods delegate to the pure functions in ``models.convnext`` and are
    jit-cached per (config, compute_dtype).
    """

    def __init__(self, cfg: ConvNeXtConfig, params: Params, compute_dtype=jnp.float32,
                 auto_fast_serving: bool = True):
        if auto_fast_serving and compute_dtype != jnp.float32:
            # bf16 serving defaults to the fast pair: tanh-GELU blocks (the
            # erf-vs-tanh deviation <=1.1e-3 is below bf16 rounding, and the
            # erf polynomial alone costs ~45% of forward time on the VPU)
            # and frontend precision "default" (single-pass bf16 DFT/mel
            # GEMMs, ~6% whole-model - certified on trained flagship weights
            # at mAP delta 0.0 / top-1 1.0 / max prob delta 6.5e-3 vs the
            # reference f32 pipeline, SERVING_PARITY_r04.json). Each switch
            # applies independently and only to the dataclass-default value;
            # pass auto_fast_serving=False to keep exact-erf/"highest" under
            # bf16 (e.g. to separate rounding from flavor effects). An
            # explicitly-passed default is indistinguishable from the
            # dataclass default here, so say what happened out loud.
            import dataclasses
            import warnings

            switched = []
            if cfg.block_impl == "xla":
                cfg = dataclasses.replace(cfg, block_impl="xla_approx")
                switched.append("block_impl 'xla' -> 'xla_approx' (tanh GELU)")
            if cfg.frontend.precision == "highest":
                cfg = dataclasses.replace(
                    cfg, frontend=dataclasses.replace(cfg.frontend,
                                                      precision="default"))
                switched.append("frontend precision 'highest' -> 'default' "
                                "(single-pass bf16 DFT/mel GEMMs)")
            if switched:
                warnings.warn(
                    "bf16 serving auto-switched: " + "; ".join(switched)
                    + ". Pass auto_fast_serving=False to keep the exact "
                    "f32-parity settings under bf16.",
                    stacklevel=2,
                )
        self.cfg = cfg
        self.params = params
        self.compute_dtype = compute_dtype
        self.frontend = LogMelFrontend(cfg.frontend, compute_dtype=compute_dtype)

        def _with_pcm_decode(fn):
            # int16 waveforms decode on-device (ops/pcm.py, the reference's
            # utilities.py:226-227 semantics) inside the jitted program:
            # shipping PCM halves host->device bandwidth on the serving path.
            # dtype is static under jit, so the branch costs nothing.
            def wrapped(params, waveform):
                from audioset_convnext_inf_tpu.ops.pcm import decode_pcm_if_int16

                return fn(params, decode_pcm_if_int16(waveform), cfg=cfg,
                          frontend=self.frontend, compute_dtype=compute_dtype)
            return wrapped

        self._jit_forward = jax.jit(_with_pcm_decode(F.forward))
        self._jit_scene = jax.jit(_with_pcm_decode(F.forward_scene_embeddings))
        self._jit_frame = jax.jit(_with_pcm_decode(F.forward_frame_embeddings))

    # -- reference API ------------------------------------------------------
    def __call__(self, waveform) -> Dict[str, jnp.ndarray]:
        return self.forward(waveform)

    def forward(self, waveform) -> Dict[str, jnp.ndarray]:
        return self._jit_forward(self.params, jnp.asarray(waveform))

    def forward_scene_embeddings(self, waveform) -> jnp.ndarray:
        return self._jit_scene(self.params, jnp.asarray(waveform))

    def forward_frame_embeddings(self, waveform) -> jnp.ndarray:
        return self._jit_frame(self.params, jnp.asarray(waveform))

    def count_parameters(self) -> int:
        return F.count_parameters(self.params)

    @classmethod
    def from_pretrained(
        cls,
        pretrained_checkpoint_path: str,
        compute_dtype=jnp.float32,
        cfg: Optional[ConvNeXtConfig] = None,
        auto_fast_serving: bool = True,
    ) -> "ConvNeXt":
        """Load from a local ``.pth``/``.safetensors``/native checkpoint, a
        Zenodo URL, or a HuggingFace model id (reference convnext.py:404-511).
        """
        from audioset_convnext_inf_tpu.checkpoint import load_pretrained

        if cfg is None:
            cfg = ConvNeXtConfig(drop_path_rate=0.0, after_stem_dim=(252, 56))
        params = load_pretrained(pretrained_checkpoint_path, cfg)
        return cls(cfg, params, compute_dtype=compute_dtype,
                   auto_fast_serving=auto_fast_serving)


# ---------------------------------------------------------------------------
# Factories (reference convnext.py:569-901)
# ---------------------------------------------------------------------------

_VARIANTS: Dict[str, Tuple[Tuple[int, ...], Tuple[int, ...]]] = {
    "convnext_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_femto": ((2, 2, 6, 2), (48, 96, 192, 384)),
    "convnext_pico": ((2, 2, 6, 2), (64, 128, 256, 512)),
    "convnext_nano": ((2, 2, 8, 2), (80, 160, 320, 640)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
}


def _make_factory(name: str) -> Callable[..., ConvNeXt]:
    depths, dims = _VARIANTS[name]

    def factory(
        drop_path_rate: float = 0.1,
        after_stem_dim=(252, 56),
        use_speed_perturb: bool = False,
        use_pydub_augment: bool = False,
        use_roll_augment: bool = False,
        seed: int = 0,
        compute_dtype=jnp.float32,
        pretrained_imagenet: Optional[str] = None,
        **kwargs,
    ) -> ConvNeXt:
        cfg = ConvNeXtConfig(
            name=name,
            depths=depths,
            dims=dims,
            drop_path_rate=drop_path_rate,
            after_stem_dim=tuple(after_stem_dim),
            augment=AugmentConfig(
                use_speed_perturb=use_speed_perturb,
                use_pydub_augment=use_pydub_augment,
                use_roll_augment=use_roll_augment,
            ),
            **kwargs,
        )
        params = F.init_params(jax.random.PRNGKey(seed), cfg)
        if pretrained_imagenet:
            # non-strict ImageNet backbone init + audio stem, the TPU-native
            # equivalent of the reference's pretrained=True route
            # (convnext.py:663-707); expects a local image-ConvNeXt .pth
            import torch

            from audioset_convnext_inf_tpu.checkpoint.convert import load_imagenet_backbone

            sd = torch.load(pretrained_imagenet, map_location="cpu", weights_only=True)
            params = load_imagenet_backbone(sd, cfg, params)
        return ConvNeXt(cfg, params, compute_dtype=compute_dtype)

    factory.__name__ = name
    factory.__doc__ = f"{name}: depths={depths}, dims={dims} (audio stem, 527 classes)."
    return factory


convnext_atto = _make_factory("convnext_atto")
convnext_femto = _make_factory("convnext_femto")
convnext_pico = _make_factory("convnext_pico")
convnext_nano = _make_factory("convnext_nano")
convnext_tiny = _make_factory("convnext_tiny")
convnext_small = _make_factory("convnext_small")
convnext_base = _make_factory("convnext_base")

MODEL_REGISTRY: Dict[str, Callable[..., ConvNeXt]] = {
    name: _make_factory(name) for name in _VARIANTS
}


def create_model(name: str, **kwargs) -> ConvNeXt:
    """Dispatch by model-type string - the safe version of the reference's
    ``eval(model_type)`` zoo dispatch (main.py:427-543)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name](**kwargs)
