"""On-device (TPU) dense-CRF mean-field inference.

The host CRF paths (eval/crf.py: exact oracle, native permutohedral
lattice, numpy bilateral grid) refine ~1 image/second/core — the last
seconds-per-image host component in the eval stack. This module runs the
same Krähenbühl & Koltun mean-field update (reference network.py:63
hyperparameters: bilateral sxy=121/srgb=5/compat=10, spatial
sxy=3/compat=3, 10 iterations) fully inside jit, batched, so denseCRF
evaluation rides the TPU instead of a host worker pool.

Algorithm = the numpy bilateral-grid path, re-expressed in XLA ops:

* spatial kernel: separable Gaussian filtering (slice-shift-accumulate,
  zero padded) with a normalized-convolution mask so image borders and
  bucket padding behave like mode="constant" filtering of the unpadded
  image;
* bilateral kernel: splat (scatter-add) into a dense 5-D grid sampled at
  one cell per kernel std, small separable Gaussian blur (sigma=1 cell,
  truncate=2.0 — scipy's exact taps), nearest-cell slice (gather),
  homogeneous-channel normalization.

The Gaussian taps, grid geometry, and coordinate rounding replicate
eval/crf.py's scipy/numpy path bit-for-bit at trace time, so
tests/test_crf_tpu.py can pin agreement to float tolerance rather than a
loose statistical bound. Spatial cell indices are static (they depend
only on the image shape); only the three color coordinates are traced.

Static shapes: the batched entry point pads images to one bucket and
carries a validity mask, so the whole val set compiles ONCE. A masked
pixel splats zero mass and contributes nothing to any valid pixel's
update (tests pin pad-invariance); its own output is garbage and must be
cropped by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from em_adapt_tpu.config import EvalConfig


def _gauss_taps(sigma: float, truncate: float) -> np.ndarray:
    """scipy.ndimage.gaussian_filter1d's kernel (order 0): radius =
    int(truncate*sigma + 0.5), taps exp(-x^2 / (2 sigma^2)) normalized."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * x * x / (float(sigma) ** 2))
    return (k / k.sum()).astype(np.float32)


def _filter1d(x: jax.Array, taps: np.ndarray, axis: int) -> jax.Array:
    """Zero-padded 1-D correlation along ``axis`` (mode="constant")."""
    r = (taps.size - 1) // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (r, r)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]
    out = taps[0] * jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    for k in range(1, taps.size):
        out = out + taps[k] * jax.lax.slice_in_dim(xp, k, k + n, axis=axis)
    return out


def _spatial_filter(
    q: jax.Array,
    mask: jax.Array,
    taps: np.ndarray,
    den: jax.Array | None = None,
) -> jax.Array:
    """Normalized spatial Gaussian of q [H,W,C] restricted to mask [H,W,1].

    With mask == 1 everywhere this equals eval/crf.py::_gaussian_filter_xy
    (gauss(q) / gauss(ones)); with bucket padding the masked normalized
    convolution equals filtering the unpadded image. ``den`` — the
    filtered mask, which depends only on (mask, taps) — may be
    precomputed by loops that call this per iteration."""
    num = _filter1d(_filter1d(q * mask, taps, 0), taps, 1)
    if den is None:
        den = _filter1d(_filter1d(mask, taps, 0), taps, 1)
    return num / jnp.maximum(den, 1e-8)


@functools.lru_cache(maxsize=None)
def _grid_geometry(h: int, w: int, sxy: float, srgb: float):
    """Static bilateral-grid geometry for an HxW image.

    Spatial cell indices depend only on the shape — computed in numpy at
    trace time (same float32 divide + banker's rounding as
    eval/crf.py::_bilateral_grid_filter). Color dims cover the full uint8
    range; cells beyond an image's actual max are empty and, the blur
    being linear with zero padding, change nothing (so the static grid
    matches numpy's data-dependent ``int(idx.max())+1`` sizing exactly).
    """
    ys = np.arange(h, dtype=np.float32) / np.float32(sxy)
    xs = np.arange(w, dtype=np.float32) / np.float32(sxy)
    iy = np.round(ys).astype(np.int32)
    ix = np.round(xs).astype(np.int32)
    gy, gx = int(iy.max()) + 1, int(ix.max()) + 1
    gc = int(np.round(np.float32(255.0) / np.float32(srgb))) + 1
    size = gy * gx * gc**3
    if size >= 2**31:  # flat indices are int32 on device
        raise ValueError(
            f"bilateral grid has {size} cells (image {h}x{w}, sxy={sxy}, "
            f"srgb={srgb}) — exceeds int32 indexing; raise srgb/sxy or use "
            "the host CRF"
        )
    # flat index = ((((iy*gx + ix)*gc + ir)*gc + ig)*gc + ib
    spatial_flat = (iy[:, None].astype(np.int64) * gx + ix[None, :]) * (gc**3)
    return gy, gx, gc, spatial_flat.reshape(-1).astype(np.int32)


def _bilateral_flat_index(
    rgb: jax.Array, *, sxy: float, srgb: float
) -> tuple[tuple[int, int, int], jax.Array]:
    """Per-pixel flat bilateral-grid cell index [H*W] for a guide image
    [H,W,3] uint8, plus the (gy, gx, gc) grid shape. The guide is
    iteration-invariant, so the mean-field loop computes this ONCE
    outside its body and closes over it."""
    h, w = rgb.shape[:2]
    gy, gx, gc, spatial_flat = _grid_geometry(h, w, float(sxy), float(srgb))
    col = rgb.astype(jnp.float32) / jnp.float32(srgb)
    ci = jnp.round(col).astype(jnp.int32)  # [H,W,3]
    color_flat = (ci[..., 0] * gc + ci[..., 1]) * gc + ci[..., 2]
    flat = jnp.asarray(spatial_flat) + color_flat.reshape(-1)
    return (gy, gx, gc), flat


def _bilateral_grid_splat_blur_slice(
    q: jax.Array,
    mask: jax.Array,
    flat: jax.Array,
    grid_shape: tuple[int, int, int],
    taps: np.ndarray,
) -> jax.Array:
    """Splat/blur/slice bilateral filtering of q [H,W,C] weighted by mask
    [H,W,1], using a precomputed flat cell index from
    :func:`_bilateral_flat_index`. Returns the filtered [H,W,C] map."""
    h, w, c = q.shape
    gy, gx, gc = grid_shape
    size = gy * gx * gc * gc * gc
    vals = jnp.concatenate([q * mask, mask], axis=-1).reshape(-1, c + 1)
    grid = jnp.zeros((size, c + 1), jnp.float32).at[flat].add(vals)
    grid = grid.reshape(gy, gx, gc, gc, gc, c + 1)
    for axis in range(5):
        grid = _filter1d(grid, taps, axis)
    sliced = grid.reshape(size, c + 1)[flat].reshape(h, w, c + 1)
    return sliced[..., :c] / jnp.maximum(sliced[..., c:], 1e-8)


def _bilateral_grid_filter_tpu(
    q: jax.Array,
    rgb: jax.Array,
    mask: jax.Array,
    *,
    sxy: float,
    srgb: float,
    taps: np.ndarray,
) -> jax.Array:
    """One-shot splat/blur/slice bilateral filtering of q [H,W,C] guided
    by rgb [H,W,3] uint8, weighted by mask [H,W,1]. Convenience wrapper;
    loops should hoist :func:`_bilateral_flat_index` and call
    :func:`_bilateral_grid_splat_blur_slice` per iteration."""
    grid_shape, flat = _bilateral_flat_index(rgb, sxy=sxy, srgb=srgb)
    return _bilateral_grid_splat_blur_slice(q, mask, flat, grid_shape, taps)


def _crf_refine_one(
    probs: jax.Array,
    rgb: jax.Array,
    mask: jax.Array,
    *,
    bi_sxy: float,
    bi_srgb: float,
    bi_compat: float,
    g_sxy: float,
    g_compat: float,
    iterations: int,
) -> jax.Array:
    """Mean-field dense-CRF on one [H,W,C] probability map (traced).

    Update identical to eval/crf.py::dense_crf (Potts compatibility; the
    label-independent total filtered mass cancels in the softmax, leaving
    +compat * filtered_l — see the derivation there)."""
    probs = probs.astype(jnp.float32)
    mask = mask.astype(jnp.float32)[..., None]
    sp_taps = _gauss_taps(g_sxy, truncate=4.0)  # scipy default truncate
    bl_taps = _gauss_taps(1.0, truncate=2.0)  # grid blur: 1 cell std
    log_unary = jnp.log(jnp.maximum(probs, 1e-8))

    # Bilateral coordinates depend only on the guide image — computed
    # ONCE here, outside the loop body, and closed over (not left for
    # XLA's loop-invariant code motion to find).
    grid_shape, flat = _bilateral_flat_index(rgb, sxy=bi_sxy, srgb=bi_srgb)
    sp_den = _filter1d(_filter1d(mask, sp_taps, 0), sp_taps, 1)

    def body(_, q):
        sp = _spatial_filter(q, mask, sp_taps, den=sp_den)
        bi = _bilateral_grid_splat_blur_slice(q, mask, flat, grid_shape, bl_taps)
        energy = log_unary + g_compat * sp + bi_compat * bi
        energy = energy - energy.max(-1, keepdims=True)
        e = jnp.exp(energy)
        return e / e.sum(-1, keepdims=True)

    return jax.lax.fori_loop(0, iterations, body, probs)


@functools.lru_cache(maxsize=8)
def _compiled_batch(
    bi_sxy: float,
    bi_srgb: float,
    bi_compat: float,
    g_sxy: float,
    g_compat: float,
    iterations: int,
):
    fn = functools.partial(
        _crf_refine_one,
        bi_sxy=bi_sxy,
        bi_srgb=bi_srgb,
        bi_compat=bi_compat,
        g_sxy=g_sxy,
        g_compat=g_compat,
        iterations=iterations,
    )
    # lax.map (sequential per-image), NOT vmap: vmap's batched-scatter
    # lowering of the bilateral-grid splat reproducibly faults the TPU
    # runtime on specific guide-image combinations whose images each
    # pass individually (tools/repro_crf_tpu_fault.py; v5e via the axon
    # relay). The CRF is compute-bound with flat batch scaling
    # (PROFILE.md), so serializing the batch dim costs ~nothing and the
    # per-image program does not hit the bug. Same rationale as
    # eval/predict.py::_make_device_voc_post.
    return jax.jit(
        lambda probs, rgb, mask: jax.lax.map(
            lambda args: fn(*args), (probs, rgb, mask)
        )
    )


def _compiled_scalar_probe(cfg: EvalConfig, iterations: int):
    """Benchmark probe: the batched CRF reduced to ONE scalar in-graph, so
    timing fetches 4 bytes instead of the refined maps (the relay moves
    ~12 MB/s; see CLAUDE.md's benchmarking rules)."""
    batched = make_crf_tpu(cfg, num_iterations=iterations)
    return jax.jit(lambda p, r, m: jnp.sum(batched(p, r, m)))


def make_crf_tpu(cfg: EvalConfig | None = None, *, num_iterations: int | None = None):
    """Jitted batched CRF: (probs [B,H,W,C] f32, rgb [B,H,W,3] uint8,
    mask [B,H,W] — 1 on valid pixels) -> refined probs [B,H,W,C].

    One compile per (shape, hyperparameter) pair; pad images to a common
    bucket and mask the padding (outputs at masked pixels are garbage —
    crop before use)."""
    cfg = cfg or EvalConfig()
    iters = cfg.crf_iterations if num_iterations is None else num_iterations
    return _compiled_batch(
        float(cfg.crf_bi_sxy),
        float(cfg.crf_bi_srgb),
        float(cfg.crf_bi_compat),
        float(cfg.crf_g_sxy),
        float(cfg.crf_g_compat),
        int(iters),
    )


def dense_crf_tpu(
    probs: np.ndarray,
    rgb: np.ndarray,
    cfg: EvalConfig | None = None,
    *,
    num_iterations: int | None = None,
    mask: np.ndarray | None = None,
) -> np.ndarray:
    """Single-image convenience twin of eval/crf.py::dense_crf running the
    mean-field on the default JAX device. probs [H,W,C], rgb [H,W,3]
    uint8, optional mask [H,W]. Prefer make_crf_tpu + bucketed batches
    for throughput (per-image dispatch pays the relay/dispatch floor)."""
    cfg = cfg or EvalConfig()
    probs = np.asarray(probs, np.float32)
    if mask is None:
        mask = np.ones(probs.shape[:2], np.float32)
    fn = make_crf_tpu(cfg, num_iterations=num_iterations)
    out = fn(probs[None], np.asarray(rgb, np.uint8)[None], np.asarray(mask, np.float32)[None])
    return np.asarray(out[0])
