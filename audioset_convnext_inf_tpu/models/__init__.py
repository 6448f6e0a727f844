"""Model zoo: configs, factories and the bundled ConvNeXt API object."""

from audioset_convnext_inf_tpu.models.api import (
    ConvNeXt,
    convnext_atto,
    convnext_base,
    convnext_femto,
    convnext_nano,
    convnext_pico,
    convnext_small,
    convnext_tiny,
    create_model,
    MODEL_REGISTRY,
)
from audioset_convnext_inf_tpu.models import convnext as convnext_fn
from audioset_convnext_inf_tpu.models.pann import (
    PANN_REGISTRY,
    PannConfig,
    PannModel,
    create_pann_model,
)

__all__ = [
    "ConvNeXt",
    "convnext_atto",
    "convnext_femto",
    "convnext_pico",
    "convnext_nano",
    "convnext_tiny",
    "convnext_small",
    "convnext_base",
    "create_model",
    "MODEL_REGISTRY",
    "convnext_fn",
]
