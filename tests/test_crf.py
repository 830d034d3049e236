"""denseCRF validation against an exact brute-force mean-field oracle.

The reference's published 37.98% mIoU includes denseCRF post-processing
(reference readme.md:40) with the hyperparameters preserved at reference
network.py:63. The production path approximates the two Gaussian kernels
(bilateral grid + ndimage spatial); these tests quantify that
approximation against `_exact_kernel_filter`, the O((HW)^2) dense kernel
both approximations target.

Measured error profile (committed numbers, 2026-08-16):
  * spatial filter vs exact: max |d| ~ 1.5e-5  (essentially exact)
  * bilateral grid vs exact, filter level: mean |d| ~ 0.012, max ~ 0.085
  * end-to-end with CONFIDENT unaries (the operating regime after
    training): label agreement 100%, mean |dq| < 1e-8 — mean-field with
    compat=10 saturates, absorbing the filter error.
  * end-to-end with near-uniform random unaries the fixed point can
    differ (agreement as low as ~66%) — that regime is chaotic for ANY
    approximate filter (the exact oracle itself is hypersensitive there),
    which is why the tests pin the confident regime and the filter-level
    bounds rather than chaotic fixed points.
"""

import numpy as np
import pytest

from em_adapt_tpu.config import EvalConfig
from em_adapt_tpu.eval.crf import (
    _bilateral_feats,
    _bilateral_grid_filter,
    _exact_kernel_filter,
    _gaussian_filter_xy,
    _spatial_feats,
    dense_crf,
)


def _two_region_case(seed=0, h=24, w=24, c=3, unary_strength=1.5):
    rng = np.random.default_rng(seed)
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = (200, 40, 40)
    rgb[:, w // 2 :] = (40, 40, 200)
    rgb = np.clip(
        rgb.astype(int) + rng.integers(-15, 15, rgb.shape), 0, 255
    ).astype(np.uint8)
    logits = rng.normal(size=(h, w, c)).astype(np.float32)
    logits[:, : w // 2, 0] += unary_strength
    logits[:, w // 2 :, 1] += unary_strength
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True), rgb


def test_spatial_filter_matches_bruteforce():
    probs, _ = _two_region_case()
    cfg = EvalConfig()
    got = _gaussian_filter_xy(probs, cfg.crf_g_sxy)
    want = _exact_kernel_filter(probs, _spatial_feats(24, 24, cfg.crf_g_sxy))
    assert np.abs(got - want).max() < 1e-4


def test_bilateral_grid_filter_error_bounded():
    probs, rgb = _two_region_case()
    cfg = EvalConfig()
    got = _bilateral_grid_filter(probs, rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    want = _exact_kernel_filter(
        probs, _bilateral_feats(rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    )
    err = np.abs(got - want)
    assert err.mean() < 0.03, err.mean()
    assert err.max() < 0.15, err.max()


def test_dense_crf_grid_matches_exact_oracle_end_to_end():
    """Confident-unary regime (trained fc8 logits): the approximate CRF
    must reach the same labels as the exact mean-field oracle."""
    for seed in range(3):
        probs, rgb = _two_region_case(seed=seed)
        cfg = EvalConfig()
        got = dense_crf(probs, rgb, cfg)
        want = dense_crf(probs, rgb, cfg, method="exact")
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree == 1.0, f"seed {seed}: agreement {agree}"
        assert np.abs(got - want).mean() < 1e-4


def _permutohedral_available():
    try:
        from em_adapt_tpu.eval.permutohedral import available

        return available()
    except Exception:
        return False


@pytest.mark.skipif(not _permutohedral_available(),
                    reason="native permutohedral lib unavailable")
def test_permutohedral_filter_beats_grid_vs_bruteforce():
    """The native lattice must approximate the exact bilateral kernel at
    least 2x better than the grid (measured: mean ~0.005 vs ~0.012)."""
    from em_adapt_tpu.eval.permutohedral import permutohedral_filter

    probs, rgb = _two_region_case()
    cfg = EvalConfig()
    feats = _bilateral_feats(rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    want = _exact_kernel_filter(probs, feats)
    h, w, c = probs.shape
    got = permutohedral_filter(
        probs.reshape(-1, c), feats.reshape(-1, feats.shape[-1])
    ).reshape(h, w, c)
    grid = _bilateral_grid_filter(probs, rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    perm_err = np.abs(got - want).mean()
    grid_err = np.abs(grid - want).mean()
    assert perm_err < 0.01, perm_err
    assert perm_err < grid_err / 2, (perm_err, grid_err)


@pytest.mark.skipif(not _permutohedral_available(),
                    reason="native permutohedral lib unavailable")
def test_dense_crf_permutohedral_matches_exact_oracle():
    for seed in range(3):
        probs, rgb = _two_region_case(seed=seed)
        cfg = EvalConfig()
        got = dense_crf(probs, rgb, cfg, method="permutohedral")
        want = dense_crf(probs, rgb, cfg, method="exact")
        agree = (got.argmax(-1) == want.argmax(-1)).mean()
        assert agree == 1.0, f"seed {seed}: agreement {agree}"


@pytest.mark.skipif(not _permutohedral_available(),
                    reason="native permutohedral lib unavailable")
def test_permutohedral_lattice_reuse_is_consistent():
    """Init-once/filter-many (how mean-field uses it) must equal one-shot
    filtering, including after many reuses."""
    from em_adapt_tpu.eval.permutohedral import (
        PermutohedralLattice,
        permutohedral_filter,
    )

    probs, rgb = _two_region_case()
    cfg = EvalConfig()
    feats = _bilateral_feats(rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    h, w, c = probs.shape
    flat_f = feats.reshape(-1, feats.shape[-1])
    lat = PermutohedralLattice(flat_f)
    try:
        for _ in range(3):
            got = lat.filter(probs.reshape(-1, c))
        want = permutohedral_filter(probs.reshape(-1, c), flat_f)
        np.testing.assert_allclose(got, want, atol=1e-6)
    finally:
        lat.close()


def test_dense_crf_rejects_unknown_method():
    probs, rgb = _two_region_case()
    with pytest.raises(ValueError, match="method"):
        dense_crf(probs, rgb, EvalConfig(), method="magic")
