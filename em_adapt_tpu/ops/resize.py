"""TF1-legacy image resizes (align_corners=False, no half-pixel centers).

The reference leans on two TF1 ops whose coordinate grid differs from
``jax.image.resize`` (which uses half-pixel centers):

* ``tf.image.resize_bilinear`` — prediction upsampling
  (reference network.py:40) and augmentation (reference dataset.py:156, :169).
* ``tf.image.resize_nearest_neighbor`` — label downsampling feeding the
  E-step (reference deeplab.py:110) and label augmentation
  (reference dataset.py:158, :172).

TF1's legacy grid maps output index i to source coordinate ``i * scale``
with ``scale = in_size / out_size`` (computed in float32), clamping to the
valid range. These gather-based implementations reproduce that exactly;
E-step tag parity depends on the nearest-neighbor one being bit-faithful.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _src_coords(out_size: int, in_size: int) -> np.ndarray:
    """Legacy TF1 source coordinates: i * (in/out), float32.

    Computed in numpy at trace time (sizes are static): XLA lowers f32
    division to multiply-by-reciprocal, which is 1 ulp off TF's IEEE
    division and would skew the grid.
    """
    scale = np.float32(in_size) / np.float32(out_size)
    i = np.arange(out_size, dtype=np.float32)
    return i * scale


def resize_nearest_tf(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """TF1 resize_nearest_neighbor (align_corners=False) for NHWC or HWC.

    out[i] = in[min(floor(i * in/out), in-1)] per spatial axis.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, in_h, in_w, _ = x.shape
    out_h, out_w = size
    ys = np.minimum(np.floor(_src_coords(out_h, in_h)).astype(np.int32), in_h - 1)
    xs = np.minimum(np.floor(_src_coords(out_w, in_w)).astype(np.int32), in_w - 1)
    out = x[:, ys][:, :, xs]
    return out[0] if squeeze else out


def resize_bilinear_tf(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """TF1 resize_bilinear (align_corners=False) for NHWC or HWC, float32 out.

    Per axis: src = i * (in/out); lower = floor(src), upper = min(lower+1,
    in-1), lerp weight = src - lower. Matches TF's float32 kernel.
    """
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    _, in_h, in_w, _ = x.shape
    out_h, out_w = size
    x = x.astype(jnp.float32)

    def axis_weights(out_size, in_size):
        src = _src_coords(out_size, in_size)
        lo = np.clip(np.floor(src).astype(np.int32), 0, in_size - 1)
        hi = np.minimum(lo + 1, in_size - 1)
        t = (src - lo.astype(np.float32)).astype(np.float32)
        return lo, hi, t

    y_lo, y_hi, ty = axis_weights(out_h, in_h)
    x_lo, x_hi, tx = axis_weights(out_w, in_w)

    # Gather the 4 corners and lerp in TF's kernel order — x first, then y:
    # top = tl + (tr-tl)*tx; bottom = bl + (br-bl)*tx; out = top + (bot-top)*ty.
    tl = x[:, y_lo][:, :, x_lo]
    tr = x[:, y_lo][:, :, x_hi]
    bl = x[:, y_hi][:, :, x_lo]
    br = x[:, y_hi][:, :, x_hi]
    tx_ = tx[None, None, :, None]
    ty_ = ty[None, :, None, None]
    top = tl + (tr - tl) * tx_
    bot = bl + (br - bl) * tx_
    out = top + (bot - top) * ty_
    return out[0] if squeeze else out


def resize_bilinear_tf_dynamic(
    x: jax.Array, out_hw: jax.Array, bucket: tuple[int, int]
) -> jax.Array:
    """TF1 bilinear upsample of [H,W,C] to a TRACED size inside a static
    bucket — the on-device eval path's upsampler.

    ``out_hw`` is a traced int32 [2] (the image's original size); the
    result is a [bucket_h, bucket_w, C] array whose top-left
    ``out_hw``-sized region is the TF1-grid bilinear resize (same
    coordinate map as resize_bilinear_tf: src = i * in/out, legacy
    align_corners=False); rows/cols beyond out_hw are clamped-edge
    garbage the caller must mask. Unlike the static op, the grid is
    computed on device with traced sizes, so XLA's reciprocal-multiply
    f32 division can differ from TF's IEEE divide by 1 ulp — immaterial
    for the CRF/argmax consumer (tests quantify exact agreement with the
    static twin), but do NOT swap it into paths with bit-exactness
    contracts (E-step tag parity uses resize_nearest_tf).
    """
    in_h, in_w, _ = x.shape
    bh, bw = bucket
    x = x.astype(jnp.float32)
    oh = out_hw[0].astype(jnp.float32)
    ow = out_hw[1].astype(jnp.float32)

    def axis(out_size: int, in_size: int, out_n):
        src = jnp.arange(out_size, dtype=jnp.float32) * (
            jnp.float32(in_size) / out_n
        )
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
        hi = jnp.minimum(lo + 1, in_size - 1)
        t = src - lo.astype(jnp.float32)
        return lo, hi, t

    y_lo, y_hi, ty = axis(bh, in_h, oh)
    x_lo, x_hi, tx = axis(bw, in_w, ow)
    tl = x[y_lo][:, x_lo]
    tr = x[y_lo][:, x_hi]
    bl = x[y_hi][:, x_lo]
    br = x[y_hi][:, x_hi]
    tx_ = tx[None, :, None]
    ty_ = ty[:, None, None]
    top = tl + (tr - tl) * tx_
    bot = bl + (br - bl) * tx_
    return top + (bot - top) * ty_
