"""Optimizer: SGD+momentum, gradient accumulation, staged LR, LR groups.

Reproduces the reference's optimization semantics (reference
deeplab.py:188-208, :243-262):

* ``tf.train.MomentumOptimizer``: accum = m*accum + g; var -= lr*accum —
  exactly ``optax.sgd(momentum=...)`` (heavy-ball, no Nesterov).
* Gradient accumulation over ``accum_steps`` microbatches with mean
  semantics (the reference adds g/accum_num each step and applies every
  accum_num steps — reference deeplab.py:202-205) — ``optax.MultiSteps``.
* Step-indexed piecewise-constant LR: drops at epochs 10/20/30 measured in
  microbatch steps (reference deeplab.py:243-262). The schedule handed to
  the inner sgd is re-indexed to applied-update units, because
  ``optax.MultiSteps`` only advances the inner optimizer's count when an
  accumulated update is emitted — a microbatch-indexed schedule inside it
  would fire every drop ``accum_steps``x too late.
* Caffe LR-group multipliers (bias x2, fc8 w x10, fc8 b x20). The
  reference computes these and silently discards them (dead rebinding
  loop, reference deeplab.py:194-200), so they default OFF for
  code-parity; ``lr_multipliers=True`` enables the paper recipe.
"""

from __future__ import annotations

import jax
import optax

from em_adapt_tpu.config import OptimConfig


def lr_schedule(cfg: OptimConfig, steps_per_epoch: int) -> optax.Schedule:
    """Piecewise-constant LR over microbatch steps.

    boundaries_and_scales maps to the reference's absolute values:
    base 1e-3, then 1e-4/1e-5/1e-6 at epoch boundaries.
    """
    boundaries = {}
    prev = cfg.base_lr
    epochs = [e for e, _ in cfg.lr_schedule]
    if len(set(epochs)) != len(epochs):
        # A duplicate epoch would OVERWRITE its boundary's scale with the
        # ratio of the two conflicting LRs (e.g. ((10,1e-4),(10,1e-5))
        # silently applies 1e-2 — 10x the BASE lr) while lr_at logs a
        # sane value. No legitimate schedule has two drops at one epoch.
        raise ValueError(
            f"optim.lr_schedule has duplicate epoch boundaries: {epochs}"
        )
    # sorted: the scale chain (each boundary's scale = lr / previous lr)
    # is only correct in ascending epoch order — an unsorted override
    # like ((20,1e-5),(10,1e-4)) would otherwise build a chain whose
    # APPLIED lr between the drops is 10x the configured value while
    # lr_at (host, sorted) logs the configured one.
    for epoch, lr in sorted(cfg.lr_schedule):
        boundaries[epoch * steps_per_epoch] = lr / prev
        prev = lr
    return optax.piecewise_constant_schedule(cfg.base_lr, boundaries)


def lr_at(cfg: OptimConfig, steps_per_epoch: int, step: int) -> float:
    """Host-side evaluation of :func:`lr_schedule` at ``step`` — pure
    Python floats, no device dispatch.

    Exists for the train loop's log records: calling the optax schedule
    with a Python int executes a jnp graph eagerly on the default
    device, which on a remote-TPU relay costs a round trip per log and
    a full jit compile on the FIRST log (measured ~12 s through the
    relay — it landed inside the throughput window and distorted the
    next window's images/sec). Matches optax.piecewise_constant_schedule
    semantics: a boundary's value applies from ``step >= boundary``
    (pinned against the optax schedule by test_lr_host_matches_optax).
    """
    lr = float(cfg.base_lr)
    for epoch, val in sorted(cfg.lr_schedule):
        if step >= epoch * steps_per_epoch:
            lr = float(val)
    return lr


def _lr_group(path: tuple, _) -> str:
    """Classify a param leaf into its Caffe LR group.

    path is the pytree path: (layer_name, 'w'|'b').
    """
    layer = path[0].key if hasattr(path[0], "key") else str(path[0])
    kind = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if layer == "fc8":
        return "fc8_b" if kind == "b" else "fc8_w"
    return "bias" if kind == "b" else "weight"


GROUP_MULTIPLIERS = {"weight": 1.0, "bias": 2.0, "fc8_w": 10.0, "fc8_b": 20.0}


def _scale_by_group() -> optax.GradientTransformation:
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        scaled = jax.tree_util.tree_map_with_path(
            lambda path, g: g * GROUP_MULTIPLIERS[_lr_group(path, g)], updates
        )
        return scaled, state

    return optax.GradientTransformation(init, update)


def build_optimizer(
    cfg: OptimConfig, steps_per_epoch: int
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """The full transformation chain, wrapped in MultiSteps for accumulation.

    Weight decay is NOT here: the reference adds wd*l2 to the loss
    (reference deeplab.py:185), so it arrives through the gradients.

    The returned ``sched`` is microbatch-indexed (what the reference's hot
    loop sees, deeplab.py:243-262); the copy inside the optimizer is
    re-indexed to applied-update counts so that the update emitted by
    MultiSteps at microbatch step ``(k+1)*accum - 1`` (inner count k) uses
    exactly ``sched((k+1)*accum - 1)`` — the LR the reference would apply
    at that step.
    """
    sched = lr_schedule(cfg, steps_per_epoch)
    accum = cfg.accum_steps
    if accum > 1:
        inner_sched = lambda count: sched((count + 1) * accum - 1)  # noqa: E731
    else:
        inner_sched = sched
    chain = []
    if cfg.lr_multipliers:
        chain.append(_scale_by_group())
    chain.append(optax.sgd(learning_rate=inner_sched, momentum=cfg.momentum))
    tx = optax.chain(*chain)
    if accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx, sched
