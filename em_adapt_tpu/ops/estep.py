"""Adaptive-bias E-step as a pure JAX function (runs on device, inside jit).

The reference executes this algorithm on the host inside a ``tf.py_func``
(reference deeplab.py:120), paying a device->host->device round trip under
the GIL every step. Here it is a pure function of (scores, label, orders)
traced straight into the train step, so XLA fuses it with the loss and no
host transfer exists.

Semantics are specified by :func:`em_adapt_tpu.ops.estep_oracle.estep_oracle`
(itself an exact re-derivation of reference estep.py:33-84) and enforced by
golden tests: the channel-argmax label maps are pixel-identical, and the
biased score maps match to float tolerance (the only arithmetic difference
is the reduction order of the per-image means used for the final constant
shift, which cannot change an argmax).

Design notes (TPU):
* The class-visit schedule is data: a [num_iter, C] int32 array with
  background pinned first (reference estep.py:64-66), so the sequential
  bias loop is ONE ``lax.fori_loop`` of num_iter*C trips with no dynamic
  python control flow.
* The k-th order statistic ``np.partition(diff, k)[k]`` (reference
  estep.py:73-76) is a full ``jnp.sort`` over the H*W pixels; both the bg
  and fg ranks are read from the same sorted array and selected by the
  traced class id, avoiding a data-dependent branch.
* Absent classes are handled branchlessly: their threshold is multiplied by
  the 0/1 tag, so the channel update is the identity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from em_adapt_tpu.config import EStepConfig


def derive_tags(label: jax.Array, num_classes: int) -> jax.Array:
    """Image-level tag matrix [B, C] in {0,1} from mask [B, H, W].

    Matches the oracle's uint8-cast + ``value < C`` filter
    (reference estep.py:35-44): the 255 ignore label survives the uint8
    cast and is dropped by the range check.
    """
    lab = label.astype(jnp.uint8).astype(jnp.int32)  # [B,H,W]
    classes = jnp.arange(num_classes, dtype=jnp.int32)
    hits = lab[..., None] == classes  # [B,H,W,C]
    return jnp.any(hits, axis=(1, 2)).astype(jnp.float32)  # [B,C]


def suppress_absent(scores: jax.Array, tags: jax.Array, margin: float) -> jax.Array:
    """Clamp absent-class scores above the per-pixel present-class min.

    Exact vectorization of reference estep.py:46-55 (including its use of
    the *global batch max* to lift absent channels before the channel-min).
    """
    present = tags[:, None, None, :] > 0  # [B,1,1,C]
    gmax = jnp.max(scores)
    lifted = scores + jnp.where(present, jnp.float32(0), gmax)
    present_min = jnp.min(lifted, axis=3, keepdims=True)  # [B,H,W,1]
    clamp = (~present) & (scores > present_min)
    return jnp.where(clamp, present_min - jnp.float32(margin), scores)


def make_class_orders(key: jax.Array, num_iter: int, num_classes: int) -> jax.Array:
    """[num_iter, C-1] foreground class permutations (values in 1..C-1).

    Replaces the reference's global-RNG ``random.shuffle``
    (reference estep.py:64-66) with explicit PRNG keys.
    """
    if num_iter == 0:
        # no-bias ablation (tools/convergence_rehearsal.py): zero visit
        # rounds — the E-step reduces to (optionally suppressed) argmax
        return jnp.zeros((0, num_classes - 1), jnp.int32)
    fg = jnp.arange(1, num_classes, dtype=jnp.int32)
    keys = jax.random.split(key, num_iter)
    return jnp.stack([jax.random.permutation(k, fg) for k in keys])


@functools.partial(
    jax.jit,
    static_argnames=("bg_p", "fg_p", "num_iter", "suppress_others", "margin_others"),
)
def estep(
    scores: jax.Array,
    label: jax.Array,
    orders: jax.Array,
    *,
    bg_p: float = 0.4,
    fg_p: float = 0.2,
    num_iter: int = 5,
    suppress_others: bool = True,
    margin_others: float = 1e-5,
) -> jax.Array:
    """Adaptive-bias E-step on device. See module docstring.

    Args:
      scores: [B, H, W, C] float32 score map.
      label: [B, H, W] ground-truth mask at score-map resolution.
      orders: [num_iter, C-1] int32 foreground visit order per round.

    Returns:
      [B, H, W, C] float32 biased score map (gradients should not flow:
      wrap with ``lax.stop_gradient`` — see :func:`estep_labels`).
    """
    f = scores.astype(jnp.float32)
    b, h, w, c = f.shape
    if orders.shape != (num_iter, c - 1):
        raise ValueError(
            f"orders must have shape (num_iter={num_iter}, C-1={c - 1}), "
            f"got {orders.shape}; build it with make_class_orders()"
        )
    tags = derive_tags(label, c)  # [B,C] float32

    if suppress_others:
        f = suppress_absent(f, tags, margin_others)

    before = jnp.mean(jnp.max(f, axis=3), axis=(1, 2))  # [B]
    k_bg = int(h * w * bg_p)
    k_fg = int(h * w * fg_p)

    # visit[t] for t in [0, num_iter*C): class id visited at step t,
    # background first each round (reference estep.py:64-66).
    bg = jnp.zeros((num_iter, 1), dtype=jnp.int32)
    visit = jnp.concatenate([bg, orders.astype(jnp.int32)], axis=1).reshape(-1)

    def body(t, f):
        j = visit[t]
        ch = jnp.take(f, j, axis=3)  # [B,H,W]
        diff = (jnp.max(f, axis=3) - ch).reshape(b, h * w)
        srt = jnp.sort(diff, axis=1)
        th = jnp.where(j == 0, srt[:, k_bg], srt[:, k_fg])  # [B]
        th = th * tags[:, j]  # absent class -> +0 (identity update)
        return f.at[:, :, :, j].add(th[:, None, None])

    if num_iter > 0:  # the body TRACES even for a 0-trip loop
        f = jax.lax.fori_loop(0, num_iter * c, body, f)

    after = jnp.mean(jnp.max(f, axis=3), axis=(1, 2))
    return f + (before - after)[:, None, None, None]


@functools.partial(
    jax.jit,
    static_argnames=("bg_bias", "fg_bias", "suppress_others", "margin_others",
                     "bias_units"),
)
def estep_fixed(
    scores: jax.Array,
    label: jax.Array,
    *,
    bg_bias: float = 3.0,
    fg_bias: float = 5.0,
    suppress_others: bool = True,
    margin_others: float = 1e-5,
    bias_units: str = "logit",
) -> jax.Array:
    """EM-Fixed E-step (arXiv:1502.02734 §3.3): add a CONSTANT bias to each
    present class's scores — ``bg_bias`` for background, ``fg_bias`` for
    present foreground classes — instead of EM-Adapt's rank-derived
    adaptive one. Classes absent from the image tag set get no bias (and
    are optionally clamped below the present-class min exactly like the
    adaptive path, reference estep.py:46-55). One elementwise add: no
    iterations, no sort, nothing for a custom kernel to win.

    ``bias_units``: "logit" (the paper's formulation — biases are raw
    score-unit constants) or "spread" (biases are multiples of each
    image's present-class score STD, so the effective bias tracks the
    logit spread as training sharpens it). "spread" is the control the
    round-4 erosion analysis implies (CONVERGENCE_FIXED.json: a constant
    logit-unit bias loses calibration as the spread grows — at warm-start
    spreads ~10 logits a +5 constant is small, but the bg/fg bias GAP
    stays 2 logits absolute while the model's own bg margins keep
    growing, eroding background to all-foreground). The probe result
    lives in CONVERGENCE_FIXED.json's ``warm_spread`` arm.

    Returns the biased [B, H, W, C] float32 score map (stop-gradient at
    the call site, like :func:`estep`).
    """
    if bias_units not in ("logit", "spread"):
        raise ValueError(
            f"bias_units={bias_units!r}: expected 'logit' or 'spread'"
        )
    f = scores.astype(jnp.float32)
    c = f.shape[-1]
    tags = derive_tags(label, c)  # [B,C] float32
    if suppress_others:
        f = suppress_absent(f, tags, margin_others)
    per_class = jnp.where(
        jnp.arange(c) == 0, jnp.float32(bg_bias), jnp.float32(fg_bias)
    )
    bias = (tags * per_class)[:, None, None, :]  # [B,1,1,C]
    if bias_units == "spread":
        # Per-image STD of the present-class scores (masked moments —
        # absent channels would otherwise pollute the spread with the
        # suppression clamp's artifacts).
        mask = tags[:, None, None, :]  # [B,1,1,C] broadcast over pixels
        h, w = f.shape[1], f.shape[2]
        n = jnp.maximum(jnp.sum(tags, axis=1) * (h * w), 1.0)  # [B]
        mean = jnp.sum(f * mask, axis=(1, 2, 3)) / n
        var = jnp.sum(mask * (f - mean[:, None, None, None]) ** 2,
                      axis=(1, 2, 3)) / n
        bias = bias * jnp.sqrt(var)[:, None, None, None]
    return f + bias


def _estep_pallas_dp(scores, label, orders, mesh, data_axis: str, kw: dict):
    """Run the Pallas E-step kernel under ``shard_map`` over ``data_axis``.

    Images are independent given the global batch max (the only
    cross-image coupling, reference estep.py:49), so the max is computed
    over the FULL sharded array outside the manual region (XLA partitions
    that reduction; on a mesh the partial maxes ride ICI) and passed in
    replicated. Each kernel instance then processes its local batch
    shard — this is what lets "auto" keep the fused kernel engaged on
    multi-chip meshes instead of silently falling back to the XLA sort
    path (GSPMD itself has no partitioning rule for a pallas call).

    Inputs replicate over any mesh axes other than ``data_axis`` (the
    score map is tiny at 41x41; the redundant compute is ~µs), so the
    result is identical on every such replica. ``check_vma=False``
    because pallas_call's out_shape carries no varying-manual-axes
    annotation; gradients never flow here (inputs are stop_gradient'd).
    """
    from jax.sharding import PartitionSpec as P

    from em_adapt_tpu.ops.estep_pallas import estep_pallas

    gmax = jnp.max(scores.astype(jnp.float32))

    def local(s, l, o, g):
        return estep_pallas(s, l, o, gmax=g, **kw)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(), P()),
        out_specs=P(data_axis),
        check_vma=False,
    )(scores, label, orders, gmax)


def estep_labels(
    scores: jax.Array,
    label: jax.Array,
    orders: jax.Array,
    cfg: EStepConfig,
    *,
    mesh=None,
    data_axis: str = "data",
) -> jax.Array:
    """Weak label map [B, H, W] int32 = argmax of the biased score map.

    The reference takes the channel argmax of the py_func output
    (reference deeplab.py:122-123); py_func has no gradient, which we make
    explicit with ``stop_gradient``.

    ``cfg.method`` selects the bias rule: "adaptive" (EM-Adapt, the
    reference algorithm) or "fixed" (EM-Fixed, arXiv:1502.02734 §3.3 —
    constant present-class biases; ``orders`` is ignored and may be None).

    ``mesh``/``data_axis``: the device mesh the surrounding computation is
    sharded over. On a multi-device mesh the Pallas kernel runs under
    ``shard_map`` over the data axis (see :func:`_estep_pallas_dp`);
    without a mesh, multi-device "auto" falls back to the XLA sort path.
    """
    b, h, w, c = scores.shape
    if cfg.method not in ("adaptive", "fixed"):
        raise ValueError(
            f"estep.method={cfg.method!r}: expected 'adaptive' (EM-Adapt) "
            "or 'fixed' (EM-Fixed, arXiv:1502.02734 §3.3)"
        )
    if cfg.impl not in ("auto", "jax", "pallas", "native"):
        raise ValueError(
            f"estep.impl={cfg.impl!r}: expected one of "
            "'auto', 'jax', 'pallas', 'native'"
        )
    if cfg.method == "fixed":
        # One elementwise add — fully partitionable by GSPMD on any mesh;
        # every impl choice lowers to the same XLA program.
        biased = estep_fixed(
            jax.lax.stop_gradient(scores),
            label,
            bg_bias=cfg.fixed_bg_bias,
            fg_bias=cfg.fixed_fg_bias,
            suppress_others=cfg.suppress_others,
            margin_others=cfg.margin_others,
            bias_units=cfg.fixed_bias_units,
        )
        return jnp.argmax(biased, axis=3).astype(jnp.int32)
    if cfg.impl == "native":
        # Host C++ kernel via pure_callback: CPU pipelines / cross-checks.
        # The callback is pure (out-of-place, explicit orders), so it is
        # safe under jit; it does force a device->host round trip — the
        # same one the reference paid every step (deeplab.py:120).
        import numpy as np

        from em_adapt_tpu.ops.estep_native import estep_native

        def _host(scores_h, label_h, orders_h):
            return estep_native(
                np.asarray(scores_h),
                np.asarray(label_h),
                np.asarray(orders_h),
                bg_p=cfg.bg_p,
                fg_p=cfg.fg_p,
                num_iter=cfg.num_iter,
                suppress_others=cfg.suppress_others,
                margin_others=cfg.margin_others,
            )

        biased = jax.pure_callback(
            _host,
            jax.ShapeDtypeStruct(scores.shape, jnp.float32),
            jax.lax.stop_gradient(scores).astype(jnp.float32),
            label,
            orders,
            vmap_method="sequential",
        )
        return jnp.argmax(biased, axis=3).astype(jnp.int32)
    # The Pallas kernel grids over batch tiles, so any batch size fits;
    # only a single image too large for VMEM forces the XLA path.
    from em_adapt_tpu.ops.estep_pallas import batch_tile

    from em_adapt_tpu.parallel.mesh import shard_map_eligibility

    n_dev = jax.device_count()
    can_shard, n_data, b_local = shard_map_eligibility(mesh, data_axis, b)
    kw = dict(
        bg_p=cfg.bg_p,
        fg_p=cfg.fg_p,
        num_iter=cfg.num_iter,
        suppress_others=cfg.suppress_others,
        margin_others=cfg.margin_others,
    )
    if cfg.impl == "pallas":
        use_pallas = True
        if n_dev > 1 and not can_shard:
            import warnings

            from em_adapt_tpu.parallel.mesh import (
                shard_map_ineligibility_reason,
            )

            why = shard_map_ineligibility_reason(mesh, data_axis, b)
            warnings.warn(
                "estep.impl='pallas' on >1 device with "
                f"{why}, or use impl='auto'. As-is, GSPMD has no "
                "partitioning rule for a pallas call, so XLA will "
                "all-gather the score map and run the WHOLE batch "
                "redundantly on every chip.",
                stacklevel=2,
            )
    else:
        # "auto": the kernel must compose with the device topology —
        # single device directly, multi-device via shard_map over the
        # mesh's data axis. No mesh on multi-device -> XLA sort path
        # (fully partitionable) rather than redundant gathered compute.
        use_pallas = (
            cfg.impl == "auto"
            and jax.default_backend() == "tpu"
            and (n_dev == 1 or can_shard)
            and batch_tile(b_local, h * w, c) >= 1
        )
    # Stop gradients BEFORE the E-step: EM treats its output as a fixed
    # target anyway, and a Pallas call has no JVP rule — with live tangents
    # on its inputs, linearization under jit(grad(...)) would fail.
    stopped = jax.lax.stop_gradient(scores)
    if use_pallas and can_shard:
        biased = _estep_pallas_dp(stopped, label, orders, mesh, data_axis, kw)
    elif use_pallas:
        from em_adapt_tpu.ops.estep_pallas import estep_pallas

        biased = estep_pallas(stopped, label, orders, **kw)
    else:
        biased = estep(stopped, label, orders, **kw)
    return jnp.argmax(biased, axis=3).astype(jnp.int32)
