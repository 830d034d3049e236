from em_adapt_tpu.data.augment import augment_train, preprocess_eval
from em_adapt_tpu.data.pipeline import SyntheticVOC, VOCSegmentation, batch_iterator
from em_adapt_tpu.data.voc import (
    VOC_CLASS_NAMES,
    VOC_PALETTE,
    convert_dataset,
    index_to_rgb,
    read_split,
    rgb_mask_to_index,
)

__all__ = [
    "SyntheticVOC",
    "VOCSegmentation",
    "VOC_CLASS_NAMES",
    "VOC_PALETTE",
    "augment_train",
    "batch_iterator",
    "convert_dataset",
    "index_to_rgb",
    "preprocess_eval",
    "read_split",
    "rgb_mask_to_index",
]
