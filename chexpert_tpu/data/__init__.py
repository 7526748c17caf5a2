from chexpert_tpu.data.chexpert import (
    ATTR_ALL_NAMES,
    ATTR_NAMES,
    DIR_NAME,
    PIXEL_MEAN,
    PIXEL_STD,
    ChexpertIndex,
    compute_mean_and_std,
    extract_patient_ids,
)
from chexpert_tpu.data.pipeline import Batches, device_prefetch
from chexpert_tpu.data.synthetic import make_synthetic_dataset
from chexpert_tpu.data.transforms import decode_transform, denormalize, expand_channels

__all__ = [
    "ATTR_ALL_NAMES",
    "ATTR_NAMES",
    "DIR_NAME",
    "PIXEL_MEAN",
    "PIXEL_STD",
    "ChexpertIndex",
    "compute_mean_and_std",
    "extract_patient_ids",
    "Batches",
    "device_prefetch",
    "make_synthetic_dataset",
    "decode_transform",
    "denormalize",
    "expand_channels",
]
