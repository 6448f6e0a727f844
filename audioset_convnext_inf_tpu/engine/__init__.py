from audioset_convnext_inf_tpu.engine.evaluator import Evaluator
from audioset_convnext_inf_tpu.engine.metrics import d_prime, evaluate_clipwise, summarize
from audioset_convnext_inf_tpu.engine.infer import (
    embed_long_audio,
    extract_embeddings_to_hdf5,
    load_clip,
    sliding_windows,
    tag_clip,
    tag_long_audio,
)
from audioset_convnext_inf_tpu.engine.statistics import StatisticsContainer
from audioset_convnext_inf_tpu.engine.aot_export import (
    BundleModel,
    export_serving,
    load_bundle,
    save_bundle,
)

__all__ = [
    "BundleModel",
    "export_serving",
    "save_bundle",
    "load_bundle",
    "Evaluator",
    "evaluate_clipwise",
    "summarize",
    "d_prime",
    "tag_clip",
    "tag_long_audio",
    "embed_long_audio",
    "load_clip",
    "sliding_windows",
    "extract_embeddings_to_hdf5",
    "StatisticsContainer",
]
