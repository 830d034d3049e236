"""Numpy oracle for the adaptive-bias E-step.

This is the executable specification the JAX / Pallas / native C++
implementations are golden-tested against. It reproduces, operation for
operation, the semantics of the reference's production path
(``estep_py``, reference estep.py:33-84, invoked with ``use_c=False`` from
reference deeplab.py:114), with one deliberate API change: the
per-iteration foreground class order is an explicit argument instead of
python's global ``random.shuffle`` (reference estep.py:64-66), so results
are reproducible and implementations can be compared pixel-exactly.

Algorithm (EM-Adapt E-step, Papandreou et al. arXiv:1502.02734):

1. Derive the image-level tag vector from the (downsampled) ground-truth
   mask: class c is "present" in image b iff value c occurs in the mask and
   c < num_classes. This is the weak-supervision step — only class
   presence/absence is used (reference estep.py:35-44).
2. ``suppress_others``: per pixel, any absent-class score exceeding the
   per-pixel minimum-over-present-classes is clamped to that minimum minus
   ``margin_others`` (reference estep.py:46-55). The reference computes the
   per-pixel present-min by adding the *global* batch max to absent-class
   scores before the min — replicated exactly here, quirks included.
3. Record the per-image mean of the per-pixel max (reference estep.py:56).
4. For ``num_iter`` rounds, visit background (class 0) first then the
   foreground classes in the given order; for each present class j compute
   ``diff = per_pixel_max - score_j`` and add its k-th smallest value
   (k = int(H*W*rho), rho = bg_p for background else fg_p) to the whole
   channel j — an adaptive bias making ~rho*H*W pixels prefer class j
   (reference estep.py:62-79). The per-pixel max is recomputed after every
   channel update, so class order matters.
5. Re-center: shift every score so the per-image mean of the per-pixel max
   is unchanged (reference estep.py:81-82).
"""

from __future__ import annotations

import numpy as np


def derive_tags(label: np.ndarray, num_classes: int) -> np.ndarray:
    """Image-level tag matrix [B, C] in {0,1} from a mask [B, H, W].

    Values >= num_classes (e.g. the 255 ignore label) are dropped, after a
    uint8 cast that matches the reference (reference estep.py:35, :42).
    """
    label = np.asarray(label).astype(np.uint8)
    b = label.shape[0]
    tags = np.zeros((b, num_classes), dtype=np.uint8)
    for i in range(b):
        present = np.unique(label[i])
        present = present[present < num_classes]
        tags[i, present] = 1
    return tags


def suppress_absent(
    scores: np.ndarray, tags: np.ndarray, margin: float
) -> np.ndarray:
    """Clamp absent-class scores above the per-pixel present-class min.

    Mirrors reference estep.py:46-55: the present-min is computed by adding
    the global (whole-batch) max to absent channels and taking the
    channel-min, and only scores strictly above that min are clamped.
    """
    present = tags[:, None, None, :].astype(bool)  # [B,1,1,C]
    lifted = scores + np.where(present, 0.0, np.amax(scores)).astype(scores.dtype)
    present_min = np.amin(lifted, axis=3, keepdims=True)  # [B,H,W,1]
    clamp = ~present & (scores > present_min)
    out = np.where(clamp, present_min - np.asarray(margin, scores.dtype), scores)
    return out.astype(scores.dtype)


def estep_oracle(
    scores: np.ndarray,
    label: np.ndarray,
    *,
    bg_p: float = 0.4,
    fg_p: float = 0.2,
    num_iter: int = 5,
    suppress_others: bool = True,
    margin_others: float = 1e-5,
    orders: np.ndarray | None = None,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Adaptive-bias E-step, numpy reference semantics.

    Args:
      scores: [B, H, W, C] float32 network score map (fc8 logits).
      label: [B, H, W] ground-truth mask at score-map resolution (the
        reference downsamples nearest-neighbor first, deeplab.py:110).
      orders: optional [num_iter, C-1] array of foreground class ids
        (values in 1..C-1, each row a permutation); background is always
        visited first (reference estep.py:64-66 pins class 0 first).
      rng: used to draw orders when ``orders`` is None.

    Returns:
      [B, H, W, C] float32 biased score map. The weak label map is its
      channel argmax (reference deeplab.py:122-123).
    """
    f = np.array(scores, dtype=np.float32, copy=True)
    b, h, w, c = f.shape
    tags = derive_tags(label, c)

    if orders is None:
        rng = rng or np.random.default_rng(0)
        orders = np.stack(
            [rng.permutation(np.arange(1, c)) for _ in range(num_iter)]
        )
    orders = np.asarray(orders)
    assert orders.shape == (num_iter, c - 1), orders.shape

    if suppress_others:
        f = suppress_absent(f, tags, margin_others)

    before = np.mean(np.amax(f, axis=3), axis=(1, 2))  # [B]
    k_bg = int(h * w * bg_p)
    k_fg = int(h * w * fg_p)

    for it in range(num_iter):
        visit = np.concatenate([[0], orders[it]])
        for j in visit:
            k = k_bg if j == 0 else k_fg
            for i in range(b):
                if tags[i, j] > 0:
                    diff = (np.amax(f[i], axis=2) - f[i, :, :, j]).reshape(-1)
                    # k-th order statistic, 0-indexed (== np.partition(d,k)[k],
                    # reference estep.py:73-76).
                    th = np.partition(diff, k)[k]
                    f[i, :, :, j] += th

    after = np.mean(np.amax(f, axis=3), axis=(1, 2))
    f += (before - after).reshape(-1, 1, 1, 1)
    return f.astype(np.float32)
