"""Configuration tree for the TPU-native AudioSet ConvNeXt stack.

The reference scatters its configuration between a constants module
(``utils/config.py:8-33``), hard-coded DSP constants inside each model
(``pytorch/convnext.py:161-174``) and argparse CLIs. Here everything lives in
one serializable dataclass tree: frontend (DSP), model (trunk), augmentation,
and runtime (mesh/dtype) configs, saved alongside checkpoints.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

# ---------------------------------------------------------------------------
# Global audio constants (reference: utils/config.py:8-9)
# ---------------------------------------------------------------------------
SAMPLE_RATE = 32000
CLIP_SECONDS = 10
CLIP_SAMPLES = SAMPLE_RATE * CLIP_SECONDS  # 320000
NUM_CLASSES = 527

# int16 PCM -> float32 decode scale (reference utilities.py:226-227). Every
# decode site - the native C++ kernels and their numpy fallbacks
# (utils/native.py), the on-device decodes (models/api.py,
# engine/evaluator.py) and the service's host promotion (engine/service.py)
# - multiplies by THIS value in float32. They must stay bit-identical:
# a site that drifts (f64 divide, /32768, ...) reintroduces the ~1-ulp
# decode skew that broke train-run determinism in round 4.
INT16_SCALE = 1.0 / 32767.0


@dataclass(frozen=True)
class FrontendConfig:
    """STFT -> log-mel frontend, matching torchlibrosa's frozen parameters.

    Reference: pytorch/convnext.py:161-200 (Spectrogram + LogmelFilterBank
    with window='hann' periodic, center=True, pad_mode='reflect', power
    spectrum, Slaney mel, ref=1.0, amin=1e-10, top_db=None).
    """

    sample_rate: int = SAMPLE_RATE
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 320
    n_mels: int = 224
    fmin: float = 50.0
    fmax: float = 14000.0
    amin: float = 1e-10
    ref: float = 1.0
    top_db: Optional[float] = None
    center: bool = True
    pad_mode: str = "reflect"
    # The frontend runs as framing + GEMM-DFT in plain XLA. A fused Pallas
    # frontend kernel was built and measured SLOWER than XLA's GEMM pipeline
    # (round 1-2 negative result, NOTES.md) and deleted in round 3.
    # Matmul precision of the DFT/mel GEMMs: "highest" = true f32 (parity
    # with torchlibrosa, ~1e-4 dB error), "high" = bf16x3 passes (~2x
    # faster, error still below bf16-trunk rounding except in near-silent
    # bins), "default" = single-pass bf16 (another ~4.5 ms/B128; the bf16
    # SERVING default - certified on trained weights at mAP delta 0.0 /
    # top-1 1.0 / max prob delta 6.5e-3 vs the reference f32 pipeline,
    # SERVING_PARITY_r04.json; log-domain error in near-silent bins is
    # real, so keep "high"/"highest" for training and f32 parity work).
    # Applies to the XLA implementation.
    precision: str = "highest"
    # DFT algorithm: "conv" (default) = the windowed-DFT contraction as one
    # strided 1-D conv over hop-sized blocks (implicit framing: no
    # hop-shifted frame copies materialize, ~1 ms faster at B=128 AND
    # slightly more accurate than "direct" - 5.99e-4 vs 6.56e-4 max dB err
    # against f64); "direct" = frame + one (n_fft, n_fft//2+1) GEMM pair;
    # "ct" = two-stage Cooley-Tukey GEMM-DFT (n_fft = P*Q - ~7x fewer
    # FLOPs, measured slower on TPU, kept as the accuracy reference);
    # "rfft" = frame + XLA's native real FFT (exact f32, no precision knob;
    # speed is backend-dependent - measured on v5e in NOTES.md).
    dft_impl: str = "conv"

    @property
    def freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, num_samples: int) -> int:
        # torch.stft/torchlibrosa frame with n_fft (a win_length < n_fft
        # window is zero-padded to n_fft), so the frame count depends on
        # n_fft, not win_length.
        if self.center:
            padded = num_samples + 2 * (self.n_fft // 2)
        else:
            padded = num_samples
        return (padded - self.n_fft) // self.hop_length + 1


@dataclass(frozen=True)
class SpecAugmentConfig:
    """Time/freq stripe dropout (reference: convnext.py:203-210).

    freq_drop_width=28 = 8*224//64 to match Cnn14's relative width.
    """

    time_drop_width: int = 64
    time_stripes_num: int = 2
    freq_drop_width: int = 28
    freq_stripes_num: int = 2


@dataclass(frozen=True)
class AugmentConfig:
    """Waveform/spectrogram augmentation switches (reference: convnext.py:145-217)."""

    use_speed_perturb: bool = False
    speed_perturb_rates: Tuple[float, float] = (0.5, 1.5)
    speed_perturb_p: float = 0.5
    use_pydub_augment: bool = False  # +-7 dB random gain (augmentations.py:336-341)
    gain_augment_db: int = 7
    use_roll_augment: bool = False  # circular shift +-50 samples (augmentations.py:344-351)
    roll_shift_range: int = 50
    use_spec_augment: bool = True
    spec_augment: SpecAugmentConfig = field(default_factory=SpecAugmentConfig)
    mixup_alpha: float = 0.0  # 0 = disabled; reference uses 1.0 when enabled


@dataclass(frozen=True)
class ConvNeXtConfig:
    """ConvNeXt trunk configuration (reference: convnext.py:130-261, 569-901)."""

    name: str = "convnext_tiny"
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (96, 192, 384, 768)
    num_classes: int = NUM_CLASSES
    in_chans: int = 1
    drop_path_rate: float = 0.0
    layer_scale_init_value: float = 1e-6
    head_init_scale: float = 1.0
    # Audio patchify stem keyed on the post-stem spatial dims
    # (reference convnext.py:674-707): one of (252, 56), (504, 28),
    # (504, 56), (56,), (112,).
    after_stem_dim: Tuple[int, ...] = (252, 56)
    ln_eps: float = 1e-6
    bn_eps: float = 1e-5
    # Block tail implementation:
    #  - "xla": exact erf GELU (torch parity; erf is a slow polynomial on
    #    the TPU VPU - use for f32 parity evaluation, not serving)
    #  - "xla_approx": XLA ops with tanh GELU - the fast serving default
    #    (tanh-vs-erf deviation <=1.1e-3 absolute, below bf16 rounding);
    #    also enables the fused stage-3/4 HWBC Pallas block kernels at eval
    # (a third "pallas" fused LN->MLP tail kernel shipped in rounds 1-2;
    # it lost to "xla_approx" everywhere and was deleted in round 3 -
    # NOTES.md negative results)
    block_impl: str = "xla"
    # Training-only: rematerialize each ConvNeXt block in the backward
    # (jax.checkpoint) instead of keeping its dwconv/LN/GELU activations.
    # HBM, not compute, caps the training batch (B=512 waveforms OOMs at
    # 26.5/15.75 GB without it - NOTES.md); remat trades ~1 extra block
    # forward per backward for fitting 2-3x the batch. No effect at eval.
    remat_blocks: bool = False
    # Training-only: run stages 3-4 through the fused HWBC Pallas block
    # kernels in the TRAINING step too, via a custom VJP whose backward is
    # the fused block-backward kernel (ops/pallas_fused_block_bwd.py:
    # dgrad/wgrad stencils overlapped with the gradient GEMMs). Requires
    # block_impl="xla_approx", batch % 16 == 0, and layer scale enabled;
    # silently falls back to the XLA path otherwise. Mutually exclusive
    # with remat_blocks (the fused VJP stores x + the dwconv output and
    # recomputes LN/GELU, which is already the remat sweet spot).
    # Multi-chip: GSPMD has no partitioning rule for the Mosaic custom
    # calls, so on a multi-device mesh the trainer runs the trunk under
    # shard_map (engine/trainer.py::make_train_step) - prologue (augs,
    # frontend, bn0 batch stats, SpecAugment, mixup) stays global, each
    # device runs the fused kernels on its local batch shard, gradients
    # all-reduce through the pmean transpose. Same treatment the sharded
    # Evaluator gives the fused eval kernels.
    fused_train_blocks: bool = False
    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)

    @property
    def embed_dim(self) -> int:
        return self.dims[-1]

    def stem_geometry(self) -> Tuple[Tuple[int, int], Tuple[int, int], Tuple[int, int]]:
        """(kernel, stride, padding) of the audio patchify stem.

        Mirrors the after_stem_dim dispatch at reference convnext.py:674-703.
        Padding is (time, freq) applied symmetrically.
        """
        asd = tuple(self.after_stem_dim)
        table = {
            (252, 56): ((4, 4), (4, 4), (4, 0)),
            (504, 28): ((4, 8), (2, 8), (5, 0)),
            (504, 56): ((4, 4), (2, 4), (5, 0)),
            (56,): ((18, 4), (18, 4), (9, 0)),
            (112,): ((9, 2), (9, 2), (4, 0)),
        }
        if asd not in table:
            raise ValueError(
                f"after_stem_dim must be one of {sorted(map(list, table))}, got {list(asd)}"
            )
        return table[asd]


@dataclass(frozen=True)
class RuntimeConfig:
    """Execution-level knobs: dtype policy and device mesh layout."""

    # Compute dtype for conv/matmul inputs. Parameters and LayerNorm/BatchNorm
    # statistics always stay float32.
    compute_dtype: str = "float32"
    # Mesh axis sizes; data parallel only is needed for this model family.
    data_axis: str = "data"
    donate_batch: bool = True


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name)) for f in dataclasses.fields(cfg)}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def config_to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2)


_NESTED_FIELDS = {
    "frontend": FrontendConfig,
    "augment": AugmentConfig,
    "spec_augment": SpecAugmentConfig,
}


def _from_dict(cls, d):
    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in d:
            continue
        v = d[f.name]
        if f.name in _NESTED_FIELDS and isinstance(v, dict):
            kwargs[f.name] = _from_dict(_NESTED_FIELDS[f.name], v)
        elif isinstance(v, list):
            kwargs[f.name] = tuple(v)
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def convnext_config_from_json(s: str) -> ConvNeXtConfig:
    return _from_dict(ConvNeXtConfig, json.loads(s))
