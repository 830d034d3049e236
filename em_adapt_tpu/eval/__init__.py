from em_adapt_tpu.eval.crf_tpu import dense_crf_tpu, make_crf_tpu
from em_adapt_tpu.eval.miou import ConfusionAccumulator, confusion_matrix, miou_from_confusion
from em_adapt_tpu.eval.predict import Evaluator
from em_adapt_tpu.eval.quantize import (
    QuantizedDeepLabLargeFOV,
    quantization_agreement,
    quantize_model,
)

__all__ = [
    "ConfusionAccumulator",
    "Evaluator",
    "QuantizedDeepLabLargeFOV",
    "confusion_matrix",
    "dense_crf_tpu",
    "make_crf_tpu",
    "miou_from_confusion",
    "quantization_agreement",
    "quantize_model",
]
