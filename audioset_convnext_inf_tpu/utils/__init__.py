from audioset_convnext_inf_tpu.utils.logging_utils import (
    MetricLogger,
    create_folder,
    create_logging,
    get_filename,
    get_sub_filepaths,
)
from audioset_convnext_inf_tpu.utils.profiling import (
    StepTimer,
    count_flops,
    count_parameters,
    trace,
)

__all__ = [
    "create_logging",
    "create_folder",
    "get_filename",
    "get_sub_filepaths",
    "MetricLogger",
    "StepTimer",
    "count_flops",
    "count_parameters",
    "trace",
]
