"""Mean intersection-over-union for semantic segmentation.

The reference keeps evaluation external (readme.md:43-44 points at the
author's other repos); here mIoU is in-repo and on-device: a jitted
confusion-matrix accumulator (one [C,C] int64 bincount per batch) and the
standard VOC reduction IoU_c = TP / (TP + FP + FN), averaged over classes
that appear in ground truth or prediction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("num_classes",))
def confusion_matrix(
    pred: jax.Array, gt: jax.Array, num_classes: int
) -> jax.Array:
    """[C, C] confusion counts; rows = ground truth, cols = prediction.
    Pixels with gt >= num_classes (the 255 void label) are ignored, and so
    are out-of-range predictions (argmax output never produces them, but
    a caller feeding external/ensemble labels with a wrong class count
    must not silently corrupt OTHER cells via index wraparound)."""
    pred = pred.reshape(-1).astype(jnp.int32)
    gt = gt.reshape(-1).astype(jnp.int32)
    valid = (gt >= 0) & (gt < num_classes) & (pred >= 0) & (pred < num_classes)
    idx = jnp.where(valid, gt * num_classes + pred, num_classes * num_classes)
    counts = jnp.bincount(idx, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def miou_from_confusion(cm: np.ndarray) -> tuple[float, np.ndarray]:
    """(mean IoU, per-class IoU). Classes absent from both gt and pred get
    NaN and are excluded from the mean (standard VOC practice)."""
    cm = np.asarray(cm, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    with np.errstate(invalid="ignore", divide="ignore"):
        iou = np.where(denom > 0, tp / denom, np.nan)
    return float(np.nanmean(iou)), iou


class ConfusionAccumulator:
    """Streaming confusion matrix over batches.

    Counts accumulate on DEVICE in int32 (keeping the eval loop's
    dispatches async — no per-batch host sync) and flush to a host int64
    total before a window's PIXEL total could reach 2^31 — a single cell
    (e.g. background/background) can absorb every pixel in the window, so
    the overflow bound is pixels, not batches. ``flush_every`` additionally
    caps the window in batches. A train-split evaluation (10,582 x 321^2
    ~ 1.1e9 pixels) stays exact either way; each flush transfers 1.8 KB."""

    _PIXEL_BUDGET = 2**30  # flush before the next batch could pass 2^31

    def __init__(self, num_classes: int, flush_every: int = 128):
        self.num_classes = num_classes
        self.flush_every = flush_every
        self._host = np.zeros((num_classes, num_classes), np.int64)
        self._dev = jnp.zeros((num_classes, num_classes), jnp.int32)
        self._pending = 0
        self._pixels = 0

    def _flush(self) -> None:
        if self._pending:
            self._host += np.asarray(jax.device_get(self._dev), np.int64)
            self._dev = jnp.zeros_like(self._dev)
            self._pending = 0
            self._pixels = 0

    def update(self, pred: jax.Array, gt: jax.Array) -> None:
        n_pix = int(np.prod(pred.shape))
        if self._pixels + n_pix > self._PIXEL_BUDGET:
            # Flush BEFORE adding: large eval shapes (e.g. batch 96 at
            # 449^2) reach 2^31 pixels well inside 128 batches, and int32
            # wraparound in a dominant cell is silent.
            self._flush()
        self._dev = self._dev + confusion_matrix(pred, gt, self.num_classes)
        self._pending += 1
        self._pixels += n_pix
        if self._pending >= self.flush_every:
            self._flush()

    def update_host(self, pred: np.ndarray, gt: np.ndarray) -> None:
        """Host-side accumulation for DYNAMIC-shape inputs (the exact-VOC
        per-image path): the jitted ``confusion_matrix`` retraces per
        input shape, and VOC val has hundreds of distinct original image
        sizes — each a fresh XLA compile (minutes each on a remote TPU).
        Same semantics as :func:`confusion_matrix` (gt >= num_classes is
        void and ignored), accumulated straight into the int64 host
        total."""
        pred = np.asarray(pred).reshape(-1).astype(np.int64)
        gt = np.asarray(gt).reshape(-1).astype(np.int64)
        valid = (
            (gt >= 0) & (gt < self.num_classes)
            & (pred >= 0) & (pred < self.num_classes)
        )
        counts = np.bincount(
            gt[valid] * self.num_classes + pred[valid],
            minlength=self.num_classes * self.num_classes,
        )
        self._host += counts.reshape(self.num_classes, self.num_classes)

    def matrix(self) -> np.ndarray:
        """The accumulated [C, C] int64 confusion matrix (host copy).
        The partial-result primitive for distributed evaluation: shards
        sum their matrices (integer, order-independent) before one final
        miou_from_confusion — bit-identical to single-shard eval."""
        self._flush()
        return self._host.copy()

    def result(self) -> tuple[float, np.ndarray]:
        self._flush()
        return miou_from_confusion(self._host)
