from em_adapt_tpu.models.deeplab import (
    DeepLabLargeFOV,
    LAYER_SPECS,
    init_params,
    load_caffe_init,
)
from em_adapt_tpu.models.registry import get_model, register_model

__all__ = [
    "DeepLabLargeFOV",
    "LAYER_SPECS",
    "init_params",
    "load_caffe_init",
    "get_model",
    "register_model",
]
