from audioset_convnext_inf_tpu.data.audio_io import (
    float32_to_int16,
    int16_to_float32,
    pad_or_truncate,
    read_wav,
    resample_poly,
)
from audioset_convnext_inf_tpu.data.hdf5_dataset import AudioSetDataset, collate, load_index
from audioset_convnext_inf_tpu.data.loader import DataLoader, device_prefetch
from audioset_convnext_inf_tpu.data.samplers import (
    AlternateTrainSampler,
    BalancedTrainSampler,
    EvaluateSampler,
    TrainSampler,
    read_black_list,
)
from audioset_convnext_inf_tpu.data.pack import (
    combine_indexes,
    create_indexes,
    pack_waveforms_to_hdf5,
    read_metadata,
    split_unbalanced_csv_to_partial_csvs,
)

__all__ = [
    "AudioSetDataset",
    "DataLoader",
    "device_prefetch",
    "collate",
    "load_index",
    "TrainSampler",
    "BalancedTrainSampler",
    "AlternateTrainSampler",
    "EvaluateSampler",
    "read_black_list",
    "int16_to_float32",
    "float32_to_int16",
    "pad_or_truncate",
    "read_wav",
    "resample_poly",
    "pack_waveforms_to_hdf5",
    "create_indexes",
    "combine_indexes",
    "read_metadata",
    "split_unbalanced_csv_to_partial_csvs",
]
