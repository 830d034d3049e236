"""Fully-connected CRF post-processing (mean-field inference).

The reference delegates denseCRF to an external repo but preserves the
hyperparameters in its dead predict() stub: bilateral sxy=121, srgb=5,
compat=10; spatial (Gaussian) sxy=3, compat=3; 10 iterations (reference
network.py:63). This module implements Krähenbühl & Koltun mean-field
inference with a Potts compatibility:

    Q_l <- softmax( log U_l + sum_m compat_m * (k_m * Q)_l )

i.e. a POSITIVE coefficient on each label's own filtered mass: the Potts
penalty on the OTHER labels' mass, compat * (S - (k*Q)_l), has a
label-independent S = sum_l' (k*Q)_l' that cancels in the softmax (see
the derivation at the update site below). k_m*Q is Gaussian filtering in
(x, y) for the spatial kernel and in
(x, y, r, g, b) for the bilateral kernel. The bilateral filter uses the
standard bilateral-grid approximation (splat / blur / slice with the grid
sampled at one cell per kernel std) — the same accuracy/speed trade the
permutohedral lattice makes.

Runs on the host in numpy: CRF is a per-image eval-time refinement over
dynamic image sizes, not part of the jitted train graph.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from em_adapt_tpu.config import EvalConfig


def _gaussian_filter_xy(q: np.ndarray, sxy: float) -> np.ndarray:
    """Per-channel spatial Gaussian, normalized so the effective kernel
    sums to 1 even at image borders (normalized convolution — zero-padded
    filtering alone would shrink border messages and flip border pixels).
    q: [H,W,C]."""
    num = ndimage.gaussian_filter(q, sigma=(sxy, sxy, 0), mode="constant")
    den = ndimage.gaussian_filter(
        np.ones(q.shape[:2] + (1,), np.float32), sigma=(sxy, sxy, 0), mode="constant"
    )
    return num / np.maximum(den, 1e-8)


def _bilateral_grid_filter(
    q: np.ndarray, rgb: np.ndarray, sxy: float, srgb: float
) -> np.ndarray:
    """Bilateral filtering of q [H,W,C] guided by rgb [H,W,3] uint8.

    Splat into a downsampled 5-D grid (cell size = one std per axis), blur
    with a small separable Gaussian, slice back with nearest-cell lookup,
    and normalize by a homogeneous channel.
    """
    h, w, c = q.shape
    rgb = rgb.astype(np.float32)

    ys = (np.arange(h, dtype=np.float32) / sxy)
    xs = (np.arange(w, dtype=np.float32) / sxy)
    yy = np.broadcast_to(ys[:, None], (h, w))
    xx = np.broadcast_to(xs[None, :], (h, w))
    col = rgb / srgb  # [H,W,3]

    coords = [yy, xx, col[..., 0], col[..., 1], col[..., 2]]
    idx = [np.round(v).astype(np.int64) for v in coords]
    dims = [int(i.max()) + 1 for i in idx]

    flat = np.ravel_multi_index([i.reshape(-1) for i in idx], dims)
    size = int(np.prod(dims))

    # Splat q and a homogeneous 1-channel for normalization.
    grid = np.zeros((size, c + 1), np.float32)
    np.add.at(grid, flat, np.concatenate([q.reshape(-1, c), np.ones((h * w, 1), np.float32)], 1))
    grid = grid.reshape(*dims, c + 1)

    # Blur: std = 1 cell per axis.
    grid = ndimage.gaussian_filter(grid, sigma=(1, 1, 1, 1, 1, 0), mode="constant", truncate=2.0)

    sliced = grid.reshape(size, c + 1)[flat].reshape(h, w, c + 1)
    norm = np.maximum(sliced[..., -1:], 1e-8)
    return sliced[..., :-1] / norm


def _exact_kernel_filter(
    q: np.ndarray, feats: np.ndarray, block: int = 1024
) -> np.ndarray:
    """Brute-force O((HW)^2) normalized Gaussian filtering.

    ``feats`` [H, W, D] are feature coordinates ALREADY divided by their
    per-axis std; the kernel is exp(-0.5 * ||f_i - f_j||^2) — exactly the
    kernel the grid/lattice/ndimage paths approximate. This is the oracle
    the approximation tests quantify against (tests/test_crf.py and
    tools/bench_crf.py). Row-blocked so memory is O(block * HW) instead
    of O((HW)^2) — usable up to ~128x128 (time-bound, not memory-bound).
    """
    h, w, c = q.shape
    n = h * w
    f = feats.reshape(n, -1).astype(np.float64)
    v = q.reshape(n, c).astype(np.float64)
    sq = (f * f).sum(-1)
    num = np.empty((n, c), np.float64)
    den = np.empty((n, 1), np.float64)
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        d2 = sq[i0:i1, None] + sq[None, :] - 2.0 * (f[i0:i1] @ f.T)
        ker = np.exp(-0.5 * np.maximum(d2, 0.0))
        num[i0:i1] = ker @ v
        den[i0:i1] = ker.sum(1, keepdims=True)
    return (num / den).reshape(h, w, c).astype(np.float32)


def _spatial_feats(h: int, w: int, sxy: float) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack([yy / sxy, xx / sxy], axis=-1)


def _bilateral_feats(rgb: np.ndarray, sxy: float, srgb: float) -> np.ndarray:
    h, w = rgb.shape[:2]
    sp = _spatial_feats(h, w, sxy)
    return np.concatenate([sp, rgb.astype(np.float32) / srgb], axis=-1)


def dense_crf(
    probs: np.ndarray,
    rgb: np.ndarray,
    cfg: EvalConfig | None = None,
    *,
    num_iterations: int | None = None,
    method: str = "auto",
) -> np.ndarray:
    """Refine class probabilities with mean-field dense-CRF inference.

    Args:
      probs: [H, W, C] float softmax output (the unary is -log of this).
      rgb: [H, W, 3] uint8 original image.
      cfg: kernel hyperparameters (defaults = reference network.py:63).
      method: "auto" (native permutohedral lattice when buildable, else
        bilateral grid), "permutohedral" (force the native lattice —
        measured 2.5x closer to the exact kernel than the grid),
        "grid" (pure-numpy bilateral-grid approximation), "tpu" (the same
        grid algorithm on the default JAX device — see eval/crf_tpu.py;
        per-image dispatch, prefer make_crf_tpu batches for throughput),
        or "exact" (brute-force O((HW)^2) kernels — the validation
        oracle, tiny images only).

    Returns:
      [H, W, C] refined probabilities.
    """
    cfg = cfg or EvalConfig()
    if method not in ("auto", "permutohedral", "grid", "exact", "tpu"):
        raise ValueError(
            f"method={method!r}: expected 'auto', 'permutohedral', 'grid', "
            "'tpu' or 'exact'"
        )
    if method == "tpu":
        from em_adapt_tpu.eval.crf_tpu import dense_crf_tpu

        return dense_crf_tpu(probs, rgb, cfg, num_iterations=num_iterations)
    if method == "auto":
        from em_adapt_tpu.eval.permutohedral import available

        method = "permutohedral" if available() else "grid"
    iters = cfg.crf_iterations if num_iterations is None else num_iterations
    probs = np.asarray(probs, np.float32)
    h, w, c = probs.shape
    log_unary = np.log(np.maximum(probs, 1e-8))
    q = probs
    if method == "exact":
        sp_feats = _spatial_feats(h, w, cfg.crf_g_sxy)
        bi_feats = _bilateral_feats(rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    elif method == "permutohedral":
        from em_adapt_tpu.eval.permutohedral import PermutohedralLattice

        bi_feats = _bilateral_feats(rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
        # One lattice for all mean-field iterations (features are fixed).
        lattice = PermutohedralLattice(bi_feats.reshape(h * w, -1))

    try:
        for _ in range(iters):
            if method == "exact":
                sp = _exact_kernel_filter(q, sp_feats)
                bi = _exact_kernel_filter(q, bi_feats)
            elif method == "permutohedral":
                # Spatial kernel: ndimage separable filtering IS the exact
                # kernel (tests/test_crf.py); the lattice covers the 5-D
                # bilateral where the grid approximation was the weak link.
                sp = _gaussian_filter_xy(q, cfg.crf_g_sxy)
                bi = lattice.filter(q.reshape(h * w, c)).reshape(h, w, c)
            else:
                sp = _gaussian_filter_xy(q, cfg.crf_g_sxy)
                bi = _bilateral_grid_filter(
                    q, rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb
                )
            # Potts pairwise: label l is penalized by the filtered mass of
            # OTHER labels, compat * (S - filtered_l); S = sum_l' filtered_l'
            # is label-independent and cancels in the softmax, leaving
            # +compat * filtered_l. The filter's tiny self-contribution is
            # kept (subtracting the full q instead would add a -compat*q_l
            # anti-damping term and make the iteration oscillate).
            energy = log_unary + cfg.crf_g_compat * sp + cfg.crf_bi_compat * bi
            energy -= energy.max(-1, keepdims=True)
            e = np.exp(energy)
            q = e / e.sum(-1, keepdims=True)
    finally:
        # finally: a raising iteration must not leak the native lattice
        # (one ctypes allocation per image across a full val set).
        if method == "permutohedral":
            lattice.close()
    return q
