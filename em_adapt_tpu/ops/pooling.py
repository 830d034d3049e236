"""TF-SAME max pooling.

The reference pools with 3x3 SAME windows: stride 2 for pool1-3 (ceil-mode:
321 -> 161 -> 81 -> 41) and stride 1 for pool4-5, which is how DeepLab-
LargeFOV holds output stride 8 (reference deeplab.py:73-83). XLA's "SAME"
padding in ``lax.reduce_window`` implements exactly TF's SAME rule
(pad_total = max((out-1)*stride + k - in, 0), split low/high with the extra
element on the high side), so no custom padding math is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_same(x: jax.Array, window: int = 3, stride: int = 1) -> jax.Array:
    """NHWC max pool, k x k SAME, matching tf.nn.max_pool semantics.

    The init value must be a python literal: a traced array would force the
    generic reduce_window primitive, which has no autodiff rule — the
    literal lets JAX dispatch to the differentiable max monoid.
    """
    neg_inf = -float("inf") if jnp.issubdtype(x.dtype, jnp.floating) else int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        neg_inf,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="SAME",
    )
