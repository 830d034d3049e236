"""Host-side preprocessing/augmentation with TF1-exact resize grids.

Semantics contract (reference dataset.py:147-199):
* train: random scale s ~ U(0.75, 1.25); bilinear-resize the image and
  nearest-resize the label to (int(H*s), int(W*s)) — TRUNCATED, matching
  TF1's int32 cast (reference dataset.py:153), not rounded — then
  unconditionally resize to the fixed input size (so the "scale" is
  resampling jitter, not a crop; reference dataset.py:151-173);
* RGB -> BGR channel swap then Caffe mean subtraction
  (reference dataset.py:175-177, dataset.py:15-18);
* shared-coin left-right flip, p=0.5, same draw for image and label
  (reference dataset.py:187-192);
* eval: no jitter/flip, just resize + BGR + mean.

All of this runs in numpy on the host loader threads: the per-image
shapes are dynamic (scale jitter) which XLA cannot trace, and the work is
trivially overlapped with device compute by the pipeline's prefetcher.
The resize grids use the same TF1 legacy formula as
:mod:`em_adapt_tpu.ops.resize` (i * in/out in float32).
"""

from __future__ import annotations

import numpy as np

#: Caffe BGR channel means (reference dataset.py:15-18).
BGR_MEAN = np.array([104.00698793, 116.66876762, 122.67891434], np.float32)


def _finalize_wire(img, lab, wire_dtype: str):
    """The ONE wire-format tail shared by augment_train and
    preprocess_eval: ``"uint8"`` ships clip(round(img)) raw-RGB uint8 +
    uint8 labels (BGR+mean deferred to normalize_uint8_device on device),
    ``"float32"`` ships the reference contract (BGR mean-subtracted f32 +
    f32 labels). Two drifting copies of this branch would silently skew
    train-vs-eval preprocessing."""
    if wire_dtype == "uint8":
        out = np.ascontiguousarray(np.clip(np.round(img), 0, 255), np.uint8)
        return out, (
            None if lab is None else np.ascontiguousarray(lab, np.uint8)
        )
    out = np.ascontiguousarray(_bgr_mean_sub(img), np.float32)
    return out, (
        None if lab is None else np.ascontiguousarray(lab, np.float32)
    )


def normalize_uint8_device(x):
    """Device-side uint8 wire contract: raw RGB -> BGR, Caffe-mean
    subtracted f32 (reference dataset.py:175-177 on host; here it fuses
    into the first conv's input under jit). The ONE definition shared by
    DeepLabLargeFOV.apply and the quantized serving path — a drifting
    copy would silently break int8-vs-f32 parity for uint8 inputs."""
    import jax.numpy as jnp

    if x.dtype != jnp.uint8:
        return x
    return x.astype(jnp.float32)[..., ::-1] - jnp.asarray(BGR_MEAN)


def _coords(out_size: int, in_size: int) -> np.ndarray:
    scale = np.float32(in_size) / np.float32(out_size)
    return np.arange(out_size, dtype=np.float32) * scale


def resize_nearest_np(x: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """TF1 resize_nearest_neighbor (align_corners=False), HWC or HW."""
    in_h, in_w = x.shape[:2]
    out_h, out_w = size
    ys = np.minimum(np.floor(_coords(out_h, in_h)).astype(np.int64), in_h - 1)
    xs = np.minimum(np.floor(_coords(out_w, in_w)).astype(np.int64), in_w - 1)
    return x[ys][:, xs]


def resize_bilinear_np(x: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """TF1 resize_bilinear (align_corners=False), HWC, float32 output.

    Same corner-gather + x-then-y lerp order as the TF kernel (and our
    JAX twin in ops/resize.py).
    """
    in_h, in_w = x.shape[:2]
    out_h, out_w = size
    x = x.astype(np.float32)

    def axis(out_size, in_size):
        src = _coords(out_size, in_size)
        lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        return lo, hi, (src - lo.astype(np.float32)).astype(np.float32)

    y_lo, y_hi, ty = axis(out_h, in_h)
    x_lo, x_hi, tx = axis(out_w, in_w)
    tl = x[y_lo][:, x_lo]
    tr = x[y_lo][:, x_hi]
    bl = x[y_hi][:, x_lo]
    br = x[y_hi][:, x_hi]
    tx_ = tx[None, :, None]
    ty_ = ty[:, None, None]
    top = tl + (tr - tl) * tx_
    bot = bl + (br - bl) * tx_
    return top + (bot - top) * ty_


def _bgr_mean_sub(img: np.ndarray) -> np.ndarray:
    """RGB float image -> BGR minus Caffe mean (reference dataset.py:175-177)."""
    return img[:, :, ::-1].astype(np.float32) - BGR_MEAN


def augment_train(
    img: np.ndarray,
    label: np.ndarray,
    rng: np.random.Generator,
    *,
    input_size: tuple[int, int] = (321, 321),
    scale_range: tuple[float, float] = (0.75, 1.25),
    random_scale: bool = True,
    flip: bool = True,
    wire_dtype: str = "float32",
) -> tuple[np.ndarray, np.ndarray]:
    """Train-time preprocessing of one (uint8 RGB HWC, uint8 HW) pair.

    Returns (image f32 [H,W,3] BGR mean-subtracted, label f32 [H,W,1]) —
    the reference contract — or, with ``wire_dtype="uint8"``, a compact
    wire format: (image uint8 RGB [H,W,3], label uint8 [H,W,1]) with the
    BGR+mean normalization deferred to the device (keyed on input dtype in
    ``DeepLabLargeFOV.apply``). 4x less host->device traffic for one
    <=0.5-intensity rounding of the resized image; the label path is
    exact either way (nearest resize preserves uint8 values).
    """
    h, w = input_size
    lab = label[:, :, None] if label.ndim == 2 else label

    if random_scale:
        s = np.float32(rng.uniform(*scale_range))
        # TF computes int32(float(shape) * scale), i.e. truncation
        # (reference dataset.py:153-154).
        new_h = int(np.int32(np.float32(img.shape[0]) * s))
        new_w = int(np.int32(np.float32(img.shape[1]) * s))
        img = resize_bilinear_np(img, (new_h, new_w))
        lab = resize_nearest_np(lab, (new_h, new_w))

    img = resize_bilinear_np(img, (h, w))
    lab = resize_nearest_np(lab, (h, w))

    if flip and rng.uniform() < 0.5:
        # one shared draw flips both (reference dataset.py:187-192)
        img = img[:, ::-1]
        lab = lab[:, ::-1]

    return _finalize_wire(img, lab, wire_dtype)


def preprocess_eval(
    img: np.ndarray,
    label: np.ndarray | None = None,
    *,
    input_size: tuple[int, int] = (321, 321),
    wire_dtype: str = "float32",
) -> tuple[np.ndarray, np.ndarray | None]:
    """Eval-time preprocessing: fixed resize + BGR + mean, no augmentation
    (reference dataset.py:130). ``wire_dtype="uint8"`` defers the BGR+mean
    to the device (see :func:`augment_train`)."""
    h, w = input_size
    resized = resize_bilinear_np(img, (h, w))
    if label is None:
        out, _ = _finalize_wire(resized, None, wire_dtype)
        return out, None
    lab = label[:, :, None] if label.ndim == 2 else label
    lab = resize_nearest_np(lab, (h, w))
    return _finalize_wire(resized, lab, wire_dtype)
