"""Convolution wrappers with TF-SAME semantics (NHWC / HWIO).

The reference uses ``tf.nn.conv2d(..., padding="SAME")`` for conv1-4 and
fc7/fc8, and ``tf.nn.atrous_conv2d(rate=r, padding="SAME")`` for the conv5
block (rate 2) and fc6 (rate 4) (reference deeplab.py:58, :65, :92, :95).
XLA's "SAME" padding under ``rhs_dilation`` pads for the *effective*
(dilated) kernel extent, which is exactly what atrous_conv2d does, so a
single ``conv_general_dilated`` covers both.

These are plain convs on purpose: conv is XLA's bread and butter on the MXU
(it tiles NHWC convs onto the systolic array natively); a hand-written
Pallas conv would only get in the compiler's way.
"""

from __future__ import annotations

import jax
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


def conv2d_same(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    rate: int = 1,
    compute_dtype=None,
) -> jax.Array:
    """2-D conv, stride 1, SAME padding, optional atrous rate and bias.

    Args:
      x: [B, H, W, Cin].
      w: [kh, kw, Cin, Cout] (HWIO, same layout as the reference's
        Caffe-converted init.npy — reference deeplab.py:160).
      rate: kernel (rhs) dilation; 1 = dense conv.
      compute_dtype: cast inputs for the MXU (e.g. bfloat16). The MXU
        accumulates in f32 internally, but the conv OUTPUT is rounded to
        compute_dtype per conv (preferred_element_type is deliberately
        NOT set — see the comment below on the transpose rule); callers
        needing f32-accumulated outputs under bf16 compute must upcast
        around the call themselves.
    """
    orig_dtype = x.dtype
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    # f32 inputs get true-f32 accumulation ("highest"); with an explicit
    # low-precision compute_dtype (bf16 for the MXU) the fast default path
    # is already what was asked for. The conv output keeps the compute
    # dtype (no preferred_element_type: its transpose rule would mix f32
    # cotangents with bf16 weights); the MXU still accumulates in f32
    # internally, bf16 only rounds the result.
    precision = "highest" if x.dtype == jax.numpy.float32 else "default"
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1, 1),
        padding="SAME",
        rhs_dilation=(rate, rate),
        dimension_numbers=_DIMS,
        precision=precision,
    )
    if compute_dtype is not None:
        y = y.astype(orig_dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
