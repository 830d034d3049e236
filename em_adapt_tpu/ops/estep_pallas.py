"""Fused Pallas TPU kernel for the adaptive-bias E-step.

The pure-JAX implementation (:mod:`em_adapt_tpu.ops.estep`) lowers the
k-th-order-statistic to a full ``jnp.sort`` per (round, class) — 105
bitonic sorts of the H*W pixel vector per image at the production config.
This kernel keeps the whole per-image score map resident in VMEM across
all rounds and replaces each sort with a 31-step **bit-bisection** on the
float bit pattern:

    v* = min{ x : count(diff <= x) >= k+1 }

resolved one bit at a time (for b = 30..0: keep bit 0 iff the predicate
holds at cand | (ones below b)). Each probe is a single VPU reduction over
the [H*W, 1] diff column, so the inner loop is pure vector compute with no
HBM traffic and no O(n log^2 n) sort network. diff = rowmax - f_j >= 0
always, so nonnegative-float bit patterns compare like int32 and the
bisection is exact: the returned threshold is the identical float the
reference's ``np.partition(diff, k)[k]`` selects (reference estep.py:73-76).

Grid: one program per image (the batch is also sharded across chips by the
trainer, so per-chip B is small). Scalar inputs: the class-visit schedule
(shared across the batch, like the reference's single shuffle per round,
reference estep.py:64-66) and the global batch max used by suppression
(reference estep.py:50 — a cross-image dependency, so it is computed
outside the kernel).

Semantics contract: identical argmax label maps to
:func:`em_adapt_tpu.ops.estep_oracle.estep_oracle`; score values match to
float tolerance (mean-reduction order of the final constant shift).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    visit_ref,  # SMEM [1, L] int32 class-visit schedule
    gmax_ref,  # SMEM [1, 1] f32 global batch max
    f_ref,  # VMEM [1, HW, C] f32 scores
    lab_ref,  # VMEM [1, HW, 1] int32 labels (uint8-cast outside)
    out_ref,  # VMEM [1, HW, C] f32 biased scores
    *,
    num_classes: int,
    hw: int,
    k_bg: int,
    k_fg: int,
    num_visits: int,
    suppress: bool,
    margin: float,
):
    f = f_ref[0]  # [HW, C]
    lab = lab_ref[0]  # [HW, 1]

    class_ids = jax.lax.broadcasted_iota(jnp.int32, (1, num_classes), 1)
    # tags[0, c] = 1 iff class c occurs in the label map (values >= C,
    # e.g. the 255 ignore label, match nothing).
    hits = (lab == class_ids).astype(jnp.float32)  # [HW, C]
    tags = jnp.max(hits, axis=0, keepdims=True)  # [1, C]
    present = tags > 0.0

    if suppress:
        lifted = f + jnp.where(present, jnp.float32(0), gmax_ref[0, 0])
        pmin = jnp.min(lifted, axis=1, keepdims=True)  # [HW, 1]
        clamp = jnp.logical_and(~present, f > pmin)
        f = jnp.where(clamp, pmin - jnp.float32(margin), f)

    inv_hw = jnp.float32(1.0 / hw)
    before = jnp.sum(jnp.max(f, axis=1, keepdims=True)) * inv_hw

    def visit_body(t, f):
        j = visit_ref[0, t]
        onehot = (class_ids == j).astype(jnp.float32)  # [1, C]
        f_j = jnp.sum(f * onehot, axis=1, keepdims=True)  # [HW, 1]
        rowmax = jnp.max(f, axis=1, keepdims=True)
        diff = rowmax - f_j  # >= 0
        dbits = pltpu.bitcast(diff, jnp.int32)  # monotone for nonneg floats

        k = jnp.where(j == 0, jnp.int32(k_bg), jnp.int32(k_fg))

        def bit_body(i, cand):
            b = 30 - i
            probe = cand | ((jnp.int32(1) << b) - jnp.int32(1))
            cnt = jnp.sum((dbits <= probe).astype(jnp.int32))
            keep_zero = cnt >= k + jnp.int32(1)
            return jnp.where(keep_zero, cand, cand | (jnp.int32(1) << b))

        vstar = jax.lax.fori_loop(0, 31, bit_body, jnp.int32(0))
        th = pltpu.bitcast(vstar.reshape(1, 1), jnp.float32)[0, 0]
        is_present = jnp.sum(tags * onehot) > 0.0
        th = jnp.where(is_present, th, jnp.float32(0))
        return f + onehot * th

    f = jax.lax.fori_loop(0, num_visits, visit_body, f)

    after = jnp.sum(jnp.max(f, axis=1, keepdims=True)) * inv_hw
    out_ref[0] = f + (before - after)


@functools.partial(
    jax.jit,
    static_argnames=(
        "bg_p", "fg_p", "num_iter", "suppress_others", "margin_others", "interpret",
    ),
)
def estep_pallas(
    scores: jax.Array,
    label: jax.Array,
    orders: jax.Array,
    *,
    bg_p: float = 0.4,
    fg_p: float = 0.2,
    num_iter: int = 5,
    suppress_others: bool = True,
    margin_others: float = 1e-5,
    interpret: bool | None = None,
) -> jax.Array:
    """Drop-in replacement for :func:`em_adapt_tpu.ops.estep.estep`.

    scores [B,H,W,C] f32, label [B,H,W], orders [num_iter, C-1] int32.
    """
    b, h, w, c = scores.shape
    if orders.shape != (num_iter, c - 1):
        raise ValueError(
            f"orders must have shape (num_iter={num_iter}, C-1={c - 1}), "
            f"got {orders.shape}; build it with make_class_orders()"
        )
    hw = h * w
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    f3 = scores.astype(jnp.float32).reshape(b, hw, c)
    lab3 = label.astype(jnp.uint8).astype(jnp.int32).reshape(b, hw, 1)
    bg = jnp.zeros((num_iter, 1), jnp.int32)
    visit = jnp.concatenate([bg, orders.astype(jnp.int32)], axis=1).reshape(1, -1)
    gmax = jnp.max(f3).reshape(1, 1)

    num_visits = num_iter * c
    kernel = functools.partial(
        _kernel,
        num_classes=c,
        hw=hw,
        k_bg=int(hw * bg_p),
        k_fg=int(hw * fg_p),
        num_visits=num_visits,
        suppress=suppress_others,
        margin=margin_others,
    )
    out3 = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, num_visits), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hw, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), jnp.float32),
        interpret=interpret,
    )(visit, gmax, f3, lab3)
    return out3.reshape(b, h, w, c)
