from em_adapt_tpu.eval.miou import ConfusionAccumulator, confusion_matrix, miou_from_confusion
from em_adapt_tpu.eval.predict import Evaluator

__all__ = [
    "ConfusionAccumulator",
    "Evaluator",
    "confusion_matrix",
    "miou_from_confusion",
]
