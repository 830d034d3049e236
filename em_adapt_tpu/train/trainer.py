"""The EM training step and driver loop.

One jitted function per microbatch step — forward (with dropout) ->
on-device E-step -> cross-entropy against the weak labels -> backward ->
(accumulated) SGD+momentum update. This is the whole per-step dataflow of
the reference's hot loop (reference deeplab.py:242-280) with its three
host round-trips deleted (SURVEY.md §3.2): the batch arrives sharded on
device, the E-step is traced into the graph, and the optimizer update is
fused into the same executable.

EM semantics: the E-step output is a fixed target (stop_gradient — the
reference got this for free from tf.py_func, deeplab.py:120); gradients
flow only through the logits.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import optax

from em_adapt_tpu.config import ExperimentConfig
from em_adapt_tpu.ops.estep import estep_labels, make_class_orders
from em_adapt_tpu.ops.resize import resize_nearest_tf
from em_adapt_tpu.parallel.mesh import MeshPlan, make_mesh
from em_adapt_tpu.train.optim import build_optimizer, lr_at
from em_adapt_tpu.train.state import TrainState


def config_hints(cfg: ExperimentConfig, plan: MeshPlan) -> list[str]:
    """Measured-knowledge hints the Trainer surfaces at construction.

    Round-4 review: the spatial-sharding characterization (SPATIAL.json)
    and the EM-Fixed erosion evidence (CONVERGENCE_FIXED.json) were
    guidance living only in docs — nothing in the product applied or
    surfaced them. Returns the hint strings (tests call this directly;
    ``Trainer.__init__`` emits each as a ``UserWarning``).
    """
    hints = []
    n_devices = plan.mesh.devices.size
    if (cfg.model.input_size[0] >= 513 and n_devices > 1
            and plan.num_space_shards == 1):
        hints.append(
            f"input {cfg.model.input_size[0]}² with space=1 on a "
            f"{n_devices}-device mesh: spatial partitioning saves 56-58% "
            "per-device activation memory at >=513² (5.7 GB at 513², "
            "SPATIAL.json) for 125-199 MB/step of halo traffic — "
            "consider mesh.axes with space=3 (`--preset tpu-highres` "
            "applies space=3 + remat)"
        )
    if cfg.estep.method == "fixed" and cfg.estep.fixed_bias_units == "logit":
        hints.append(
            "estep.method='fixed' with logit-unit biases: every "
            "end-to-end run of this variant on the rehearsal task "
            "degraded the model (cold start: trivial at every bias; "
            "warm start from a 0.32 prior: erodes to all-foreground — "
            "CONVERGENCE_FIXED.json). The constant bias loses "
            "calibration as the logit spread grows; "
            "estep.fixed_bias_units='spread' with SYMMETRIC biases "
            "retained the prior (warm_spread arms), and "
            "estep.method='adaptive' is the reference algorithm"
        )
    if (cfg.estep.method == "fixed"
            and cfg.estep.fixed_bias_units == "spread"
            and cfg.estep.fixed_bg_bias != cfg.estep.fixed_fg_bias):
        hints.append(
            "estep.method='fixed' with ASYMMETRIC spread-unit biases "
            f"(bg {cfg.estep.fixed_bg_bias} != fg "
            f"{cfg.estep.fixed_fg_bias}): both asymmetric arms of the "
            "warm-start probe eroded the prior — the larger-biased side "
            "floods the other's pixels with nothing to stop it "
            "(CONVERGENCE_FIXED.json warm_spread_sweep; symmetric "
            "biases retained 0.3055 of a 0.3202 prior). Prefer equal "
            "bg/fg biases in spread units"
        )
    return hints


def tag_classification_loss(
    logits: jax.Array,
    shrunk: jax.Array,
    num_classes: int,
    smoothing: float = 0.05,
    pool_r: float = 1.0,
) -> jax.Array:
    """Weak-tag multi-label classification loss (the EM warmup objective).

    LSE-pools the score map per class — ``(1/r)·(logsumexp(r·x) −
    log(HW))`` over positions, the scaled smooth max of Pinheiro &
    Collobert (arXiv:1411.6228 §3.1) — and scores the pooled logits
    against the image-level presence tags with sigmoid BCE. Tags use the
    E-step's own presence rule (a class is present iff it occurs in the
    mask and is ``< num_classes``; the 255 ignore value drops out —
    reference estep.py:35-44 via ``ops/estep_oracle.derive_tags``).

    ``pool_r`` sets where the pool sits between mean (r→0) and max
    (r→∞). This decides what the warmup TEACHES: at r=1 a spatially
    CONSTANT score map satisfies the tag objective exactly, so the
    warmup converges to maps with no spatial discrimination and EM has
    nothing to lock onto (probed: mIoU pinned at the all-background
    value for the whole post-warmup window). Sharper pooling routes the
    gradient to the highest-scoring positions only, so PEAKED maps are
    the cheap solution — the spatially-discriminative prior EM needs.

    Not a reference feature: the reference (and the paper,
    arXiv:1502.02734) always starts EM from a CLASSIFICATION-pretrained
    network (init.npy = ImageNet VGG-16), which is what makes its E-step
    labels informative from step one. When training from random init that
    prior is absent and EM's symmetry-breaking step is heavy-tailed —
    ~250..4000 steps across seeds (CONVERGENCE_LATE_LOCK.json); this
    loss synthesizes the same kind of prior from the SAME weak tags —
    multiple-instance classification warmup — before the EM phase starts.

    ``smoothing``: hard 0/1 targets give this BCE no finite minimizer —
    the loss keeps falling as the pooled logits run to ±inf, and the
    unanchored race can diverge (a he-init 129² probe NaN'd mid-warmup
    on one seed). Smoothing the targets to [eps, 1-eps] pins the optimum
    at pooled logit = ±logit(1-eps) (~±2.9 at the default 0.05), which
    bounds the weights and keeps gradients alive through the window.
    """
    b, h, w, c = logits.shape
    lab = shrunk.astype(jnp.int32)
    # one_hot maps out-of-range (255 ignore) rows to all-zero -> dropped.
    onehot = jax.nn.one_hot(lab, num_classes, dtype=logits.dtype)
    tags = jnp.max(onehot.reshape(b, h * w, num_classes), axis=1)  # [B,C]
    tags = tags * (1.0 - 2.0 * smoothing) + smoothing
    pooled = (
        jax.nn.logsumexp(pool_r * logits.reshape(b, h * w, c), axis=1)
        - jnp.log(float(h * w))
    ) / pool_r
    return jnp.mean(optax.sigmoid_binary_cross_entropy(pooled, tags))


def loss_fn(
    params: dict,
    batch: dict,
    rng: jax.Array,
    model,
    cfg: ExperimentConfig,
    plan: MeshPlan | None = None,
    step: jax.Array | None = None,
) -> tuple[jax.Array, dict]:
    """Total loss = CE(logits, estep_labels) + wd * L2(weights).

    batch: {"image": [B,H,W,3] f32 preprocessed, "label": [B,H,W,1] f32
    mask (255=ignore), optional "is_strong": [B] bool for the
    semi-supervised variant}.

    ``plan``: the trainer's mesh plan — threads the mesh down to the two
    Pallas kernels so their "auto" modes stay engaged on multi-chip
    meshes (shard_map over the data axis). block1 only gets the mesh when
    the input is NOT spatially sharded (the kernel has no halo exchange);
    the E-step score map is tiny, so it always composes.

    ``step``: the (traced) global step counter. When
    ``cfg.train.tag_warmup_steps > 0`` and ``step`` is provided, steps
    below the threshold train on ``tag_classification_loss`` instead of
    the EM objective — a traced select, so macro-fused scan windows cross
    the warmup->EM boundary with per-step exactness (no window splitting).
    Both objectives share the single forward pass; the unselected branch
    costs only the tiny pooled-BCE / E-step epilogue.
    """
    num_classes = cfg.model.num_classes
    drop_rng, order_rng = jax.random.split(rng)

    mesh = plan.mesh if plan is not None else None
    data_axis = plan.data_axis if plan is not None else "data"
    block1_mesh = (
        mesh if plan is not None and plan.num_space_shards == 1 else None
    )
    logits = model.apply(
        params, batch["image"], train=True, rng=drop_rng,
        mesh=block1_mesh, data_axis=data_axis,
    )
    out_hw = (logits.shape[1], logits.shape[2])

    # Label shrink to score-map resolution (reference deeplab.py:110).
    # Labels already at out_hw were shrunk on the host with the identical
    # TF1 grid (DataConfig.train_label_size — the compact wire format).
    if batch["label"].shape[1:3] == out_hw:
        shrunk = batch["label"][..., 0]
    else:
        shrunk = resize_nearest_tf(batch["label"], out_hw)[..., 0]  # [B,h,w]

    orders = make_class_orders(order_rng, cfg.estep.num_iter, num_classes)
    weak = estep_labels(
        logits, shrunk, orders, cfg.estep, mesh=mesh, data_axis=data_axis
    )  # [B,h,w] int32

    flat_logits = logits.reshape(-1, num_classes)

    if cfg.semi_supervised and "is_strong" in batch:
        # Strongly-labeled images train on their true (downsampled) masks
        # with void pixels ignored (reference network.py:77-89 semantics);
        # weakly-labeled images train on the E-step assignment.
        strong = batch["is_strong"][:, None, None]  # [B,1,1]
        true_lab = shrunk.astype(jnp.int32)
        target = jnp.where(strong, true_lab, weak)
        valid = jnp.where(strong, true_lab < num_classes, True)
        ce_map = optax.softmax_cross_entropy_with_integer_labels(
            flat_logits, jnp.clip(target, 0, num_classes - 1).reshape(-1)
        ).reshape(valid.shape)
        denom = jnp.maximum(jnp.sum(valid), 1)
        ce = jnp.sum(ce_map * valid) / denom
    else:
        # Pure weak supervision: E-step labels are always valid classes, so
        # the mean runs over every pixel (reference deeplab.py:182).
        ce = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(
                flat_logits, weak.reshape(-1)
            )
        )

    if cfg.train.tag_warmup_steps > 0 and step is not None:
        tag_ce = tag_classification_loss(
            logits, shrunk, num_classes,
            cfg.train.tag_warmup_smoothing, cfg.train.tag_warmup_pool_r,
        )
        # jnp.where (not lax.cond): grads flow through the selected branch
        # only (the other is multiplied by a structural zero), and it stays
        # batchable inside the macro lax.scan.
        ce = jnp.where(step < cfg.train.tag_warmup_steps, tag_ce, ce)

    l2 = model.weight_l2(params)
    total = ce + cfg.optim.weight_decay * l2
    return total, {"loss": total, "loss_norm": ce, "loss_l2": l2}


def _step_fn(model, cfg: ExperimentConfig, tx: optax.GradientTransformation,
             plan: MeshPlan | None = None):
    """The raw (unjitted) microbatch step."""

    def step(state: TrainState, batch: dict):
        rng, new_rng = jax.random.split(jax.random.fold_in(state.rng, state.step))
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state.params, batch, rng, model, cfg, plan, state.step
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1, params=params, opt_state=opt_state, rng=new_rng
        )
        return new_state, metrics

    return step


def make_train_step(
    model,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    plan: MeshPlan,
    state_shardings=None,
) -> Callable[[TrainState, dict], tuple[TrainState, dict]]:
    """Build the jitted, mesh-sharded microbatch step.

    State is replicated (or, with a nontrivial ``model`` axis, sharded per
    ``plan.state_sharding`` — tensor parallelism for the fc head); the
    batch is sharded on the data (and optionally space) axes. XLA inserts
    every collective: the gradient psum over data, and the all-gathers /
    reduce-scatters the TP layout implies.
    """
    step = _step_fn(model, cfg, tx, plan)
    repl = plan.replicated()
    state_sh = state_shardings if state_shardings is not None else repl
    # The batch's shardings are inferred from the (already device_put,
    # per-leaf sharded) arguments — image/label may be dp+sp sharded while
    # 1-D per-image flags are dp-only.
    return jax.jit(
        step,
        in_shardings=(state_sh, None),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if cfg.train.donate_state else (),
    )


def make_macro_step(
    model,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    plan: MeshPlan,
    k: int,
    state_shardings=None,
) -> Callable[[TrainState, tuple], tuple[TrainState, dict]]:
    """K microbatch steps fused into ONE dispatch via ``lax.scan``.

    Semantically identical to calling the microbatch step K times (same
    per-step RNG folding on ``state.step``, same MultiSteps accumulation),
    but the host issues one executable per K steps — on dispatch-latency-
    limited links (this rig's axon relay has a ~30 ms per-dispatch floor)
    that overhead amortizes by K. Takes a TUPLE of K batch dicts (same
    shardings as the single step); returns the state after K steps and the
    LAST step's metrics.
    """
    step = _step_fn(model, cfg, tx, plan)

    def macro(state: TrainState, batches: tuple):
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *batches)
        return jax.lax.scan(lambda s, b: step(s, b), state, stacked)

    def macro_last(state, batches):
        state, ms = macro(state, batches)
        return state, jax.tree.map(lambda x: x[-1], ms)

    repl = plan.replicated()
    state_sh = state_shardings if state_shardings is not None else repl
    return jax.jit(
        macro_last,
        in_shardings=(state_sh, None),
        out_shardings=(state_sh, repl),
        donate_argnums=(0,) if cfg.train.donate_state else (),
    )


class Trainer:
    """Owns mesh, state, jitted step, logging and checkpoint cadence.

    Mirrors the reference's train() driver (reference deeplab.py:210-285):
    microbatch steps with accumulation inside the optimizer, LR drops at
    epoch boundaries (inside the schedule), loss logging every
    ``log_every_steps``, periodic checkpoints.
    """

    def __init__(
        self,
        cfg: ExperimentConfig,
        model=None,
        steps_per_epoch: int | None = None,
        devices=None,
    ):
        from em_adapt_tpu.models import get_model

        self.cfg = cfg
        self.plan = make_mesh(cfg.mesh, devices=devices)
        for hint in config_hints(cfg, self.plan):
            import warnings

            warnings.warn(hint, stacklevel=2)
        self.model = model or get_model(cfg.model.name)(cfg.model)
        # steps_per_epoch: data_len // batch_size (reference deeplab.py:241);
        # callers with a real dataset pass it in, tests may use a constant.
        self.steps_per_epoch = steps_per_epoch or 1
        self.tx, self.sched = build_optimizer(cfg.optim, self.steps_per_epoch)
        self.state_shardings = None
        if self.plan.num_model_shards > 1:
            abstract = jax.eval_shape(lambda: self._build_state(jax.random.key(0)))
            self.state_shardings = self.plan.state_sharding(abstract)
        self.train_step = make_train_step(
            self.model, cfg, self.tx, self.plan, self.state_shardings
        )
        self.macro_step = None
        if cfg.train.macro_steps > 1:
            self.macro_step = make_macro_step(
                self.model, cfg, self.tx, self.plan, cfg.train.macro_steps,
                self.state_shardings,
            )
        self._ckpt = None
        # -inf until fit() sees a RESUMED state (step > 0): only then is
        # the best_metric.json sidecar the same lineage. A fresh or
        # warm-started run (step 0) is a NEW lineage — inheriting a stale
        # best from a previous experiment in the same save_dir would
        # suppress its "best" checkpoints entirely (review finding).
        self._best_metric = float("-inf")
        self._warmup_barriers = 0

    def _best_metric_path(self) -> str:
        import os

        return os.path.join(
            os.path.abspath(self.cfg.checkpoint.save_dir), "best_metric.json"
        )

    def _load_best_metric(self) -> float:
        """The best-so-far eval score persists in a sidecar JSON next to
        the checkpoints: without it, a resumed run restarts the best
        comparison from -inf and its FIRST eval overwrites the "best"
        checkpoint lineage even when it scores worse than the
        pre-preemption best (round-3 review finding).

        Multi-host: only process 0 writes the sidecar, and per-host
        filesystems may differ — the value is broadcast from process 0 so
        the ``score > best`` predicate (which gates a COLLECTIVE orbax
        save) stays process-uniform."""
        import json

        try:
            with open(self._best_metric_path()) as f:
                value = float(json.load(f)["metric"])
        except (OSError, ValueError, KeyError, TypeError):
            # TypeError covers a syntactically-valid but non-dict sidecar
            # (hand-edited null/list): treat as absent, don't crash resume.
            value = float("-inf")
        if jax.process_count() > 1:
            import numpy as np
            from jax.experimental import multihost_utils

            value = float(
                multihost_utils.broadcast_one_to_all(np.float32(value))
            )
        return value

    def _store_best_metric(self, score: float, step: int) -> None:
        import json
        import os

        if jax.process_index() != 0:
            return
        path = self._best_metric_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"metric": float(score), "step": int(step)}, f)
        os.replace(tmp, path)

    def _build_state(self, key: jax.Array) -> TrainState:
        k_params, k_state = jax.random.split(key)
        if self.cfg.train.rng_impl != "threefry":
            # Re-key the training stream on the configured implementation
            # (e.g. the TPU hardware "rbg" generator — dropout mask
            # generation is ~32 ms/step cheaper at the production shape).
            k_state = jax.random.key(
                jax.random.randint(k_state, (), 0, 2**31 - 1),
                impl=self.cfg.train.rng_impl,
            )
        return TrainState.create(self.model.init(k_params), self.tx, k_state)

    def _state_shardings_or_replicated(self):
        return (
            self.state_shardings
            if self.state_shardings is not None
            else self.plan.replicated()
        )

    def init_state(self, seed: int | None = None) -> TrainState:
        seed = self.cfg.train.seed if seed is None else seed
        if jax.process_count() > 1:
            # Multi-controller: host arrays cannot be device_put onto a
            # global mesh; build the state INSIDE jit with global
            # out_shardings instead — every process runs the same program
            # and XLA materializes the global arrays directly.
            import numpy as np

            build = jax.jit(
                lambda s: self._build_state(jax.random.key(s)),
                out_shardings=self._state_shardings_or_replicated(),
            )
            return build(np.int64(seed))
        return self.place_state(self._build_state(jax.random.key(seed)))

    def place_state(self, state: TrainState) -> TrainState:
        """Put a (host or device) state onto the mesh with the trainer's
        state shardings — TP-sharded fc6/fc7 under a nontrivial ``model``
        axis, replicated otherwise. Restored checkpoints MUST go through
        this (not ``plan.replicate``) or tensor-parallel leaves come back
        replicated. Single-controller only; multi-host restore goes
        through :meth:`restore_state`."""
        if self.state_shardings is not None:
            return jax.device_put(state, self.state_shardings)
        return self.plan.replicate(state)

    def abstract_state(self) -> TrainState:
        """TrainState of ShapeDtypeStructs carrying the trainer's state
        shardings — the restore template that makes orbax materialize the
        checkpoint straight onto the (possibly multi-host) mesh."""
        abstract = jax.eval_shape(lambda: self._build_state(jax.random.key(0)))
        sh = self._state_shardings_or_replicated()
        if not isinstance(sh, TrainState):
            sh = jax.tree.map(lambda _: sh, abstract)
        return jax.tree.map(
            lambda a, s: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=s),
            abstract,
            sh,
        )

    def _multihost_warmup(self, state, batches, macro_k, remaining_steps):
        """Compile-then-barrier before the first multi-controller dispatch.

        XLA's Gloo CPU collectives initialize their TCP context through
        the coordination KV store with a hard-coded ~30 s rendezvous
        deadline (``GetKeyValue() timed out``; no env/flag override in
        this jaxlib). The first collective runs inside the first
        train-step EXECUTION, so if one process is still compiling while
        another has already dispatched, the skew eats the deadline and
        the whole job dies — reproduced repeatedly on a 1-core host
        where two processes compile the same executable concurrently.
        Fix the root cause: AOT-compile the step executables BEFORE any
        dispatch, then hold every process at a coordination-service
        barrier (which tolerates arbitrary skew, 10 min here) so the
        Gloo rendezvous starts near-simultaneously everywhere.

        Returns an iterable equivalent to ``batches`` (the peeked first
        batch, already sharded, is chained back on). With the persistent
        compilation cache enabled (the CLI default) the post-barrier jit
        call re-traces and fetches the executable from the cache; with
        the cache disabled the warmup costs one extra compile —
        correctness is unaffected either way.
        """
        import itertools

        from jax._src import distributed

        it = iter(batches)
        try:
            first = next(it)
        except StopIteration:
            return iter(())
        arrays = self.plan.ensure_batch_sharded(first)

        def aval(a):
            return jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding)

        batch_avals = {k: aval(v) for k, v in arrays.items()}
        state_avals = jax.tree.map(aval, state)
        self.train_step.lower(state_avals, batch_avals).compile()
        if self.macro_step is not None and remaining_steps >= macro_k > 1:
            self.macro_step.lower(state_avals, (batch_avals,) * macro_k).compile()
        client = distributed.global_state.client
        if client is not None:
            self._warmup_barriers += 1
            client.wait_at_barrier(
                f"em_adapt_fit_warmup_{self._warmup_barriers}",
                timeout_in_ms=600_000,
            )
        return itertools.chain([{**first, **arrays}], it)

    def restore_state(
        self, *, tag: str = "norm", step: int | None = None
    ) -> TrainState:
        """Restore a checkpoint directly onto the mesh (TP-sharded leaves
        included), without a host round trip."""
        return self.checkpointer.restore(self.abstract_state(), tag=tag, step=step)

    def warm_start(
        self,
        state: TrainState,
        save_dir: str,
        *,
        tag: str = "norm",
        step: int | None = None,
    ) -> TrainState:
        """Params-only warm start: reference ``model_path`` semantics.

        The reference's restore loads TRAINABLE VARIABLES into a fresh
        session — new optimizer slots, LR schedule restarting from the
        top (reference deeplab.py:229-234, network.py:104-110) — i.e.
        fine-tuning from a previous run's weights. ``--resume`` is the
        opposite contract (bit-exact continuation of the full state);
        this grafts only ``params`` from the checkpoint at ``save_dir``
        onto the given FRESH state, keeping its zeroed optimizer slots,
        step 0 and RNG stream.
        """
        import dataclasses as _dc

        from em_adapt_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(_dc.replace(self.cfg.checkpoint, save_dir=save_dir))
        try:
            try:
                # Fast path: the saved TrainState tree matches this run's —
                # restore directly onto the mesh and keep only params.
                new_params = mgr.restore(
                    self.abstract_state(), tag=tag, step=step
                ).params
            except FileNotFoundError:
                raise
            except Exception:
                # Tree drift: a changed optimizer config (accum_steps,
                # momentum on/off, ...) reshapes the opt_state subtree and
                # the template-driven restore fails — but model_path
                # semantics only need params. Restore the checkpoint's own
                # saved structure and graft the params subtree onto this
                # run's shardings/dtypes.
                saved = mgr.restore_saved(tag=tag, step=step)
                saved_params = (
                    saved["params"] if isinstance(saved, dict) else saved.params
                )
                # Graft inside jit with out_shardings rather than
                # device_put: on a multi-controller mesh the target
                # shardings span non-addressable devices, which
                # device_put of a host array rejects (same reason
                # init_state builds inside jit). jit accepts the host
                # arrays as replicated inputs — every process restored
                # the same checkpoint — and materializes the global
                # arrays directly.
                dtypes = jax.tree.map(lambda c: c.dtype, state.params)
                graft = jax.jit(
                    lambda ts: jax.tree.map(
                        lambda t, d: t.astype(d), ts, dtypes
                    ),
                    out_shardings=jax.tree.map(
                        lambda c: c.sharding, state.params
                    ),
                )
                new_params = graft(saved_params)
        finally:
            mgr.close()
        return state.replace(params=new_params)

    @property
    def checkpointer(self):
        if self._ckpt is None:
            from em_adapt_tpu.train.checkpoint import CheckpointManager

            self._ckpt = CheckpointManager(self.cfg.checkpoint)
        return self._ckpt

    def fit(
        self,
        state: TrainState,
        batches: Iterable[dict],
        *,
        num_steps: int | None = None,
        log_fn: Callable[[dict], None] | None = None,
        eval_fn: Callable[[TrainState], float] | None = None,
    ) -> TrainState:
        """Run the training loop over an iterable of host batches.

        ``eval_fn(state) -> metric`` (higher is better, e.g. val mIoU) runs
        every ``cfg.train.eval_every_steps``; improvements are checkpointed
        under the "best" tag.

        Hot-loop discipline (this is how the dispatch pipeline stays full
        on TPU — the reference's loop blocked three times per step,
        SURVEY.md §3.2): the step counter lives on the HOST (read from the
        device once at entry, incremented locally), batches are device_put
        with the mesh sharding on a background prefetch thread
        (``cfg.data.prefetch`` deep), and the only per-step host work is a
        dict comprehension + dispatch. Device syncs happen only at
        log/eval/checkpoint cadence.
        """
        from em_adapt_tpu.data.pipeline import DevicePrefetcher
        from em_adapt_tpu.utils.failure import GracefulShutdown, LossWatchdog

        cfg = self.cfg
        total_steps = (
            num_steps
            if num_steps is not None
            else cfg.train.epochs * self.steps_per_epoch
        )
        lr_drop_steps = {
            epoch * self.steps_per_epoch for epoch, _ in cfg.optim.lr_schedule
        }
        # One device fetch to reconcile with a restored checkpoint; from
        # here the host counter is authoritative (it advances in lockstep
        # with state.step inside the jitted step).
        step_idx = int(jax.device_get(state.step))
        if step_idx > 0 and self._best_metric == float("-inf"):
            # Resumed lineage (nonzero restored step): inherit the stored
            # best so the first post-resume eval cannot overwrite a
            # better pre-preemption "best" checkpoint. Fresh/warm-started
            # runs (step 0) keep -inf — new lineage, new best race.
            self._best_metric = self._load_best_metric()
        elif step_idx == 0:
            # New lineage: a SECOND fit() on this Trainer with a fresh
            # state must not inherit the previous run's best — its evals
            # would never beat it and the new run would end with no
            # "best" checkpoint at all.
            self._best_metric = float("-inf")
        prefetcher = None
        if cfg.data.prefetch > 0 and not isinstance(batches, DevicePrefetcher):
            prefetcher = DevicePrefetcher(batches, self.plan, depth=cfg.data.prefetch)
            batches = prefetcher
        t_window = time.time()
        n_done = 0
        n_window = 0
        watchdog = LossWatchdog()
        macro_k = max(1, cfg.train.macro_steps) if self.macro_step else 1
        buf: list = []
        metrics = None
        preempted = False
        prev_metrics = None  # metrics of the PREVIOUS dispatch (see below)

        def _checked_save(tag: str) -> None:
            # Validate the CURRENT dispatch's loss before persisting its
            # state: the in-loop watchdog checks the PREVIOUS dispatch
            # (to keep the pipeline full), so a loss that went non-finite
            # exactly on a save-boundary step would otherwise be written
            # as the latest checkpoint — and --resume would restore the
            # poisoned state (the next iteration's check then kills the
            # run, too late). The save already syncs on the state (orbax
            # fetches it to host), so this scalar fetch costs nothing
            # extra. On the preemption path, raising here deliberately
            # skips the save: keeping the last GOOD rolling checkpoint
            # beats overwriting it with a NaN state.
            nonlocal prev_metrics
            if metrics is not None:
                reason = watchdog.check(float(jax.device_get(metrics["loss"])))
                if reason is not None:
                    raise RuntimeError(f"training unhealthy: {reason}")
                prev_metrics = None  # this dispatch is now validated
            self.checkpointer.save(state, tag=tag)

        with GracefulShutdown() as shutdown, contextlib.ExitStack() as stack:
            if prefetcher is not None:
                stack.callback(prefetcher.close)
            if jax.process_count() > 1:
                batches = self._multihost_warmup(
                    state, batches, macro_k, total_steps - step_idx
                )
            batch_it = iter(batches)
            _END = object()
            stop_step = None
            while step_idx < total_steps:
                # Shutdown and budget are checked BEFORE fetching: a
                # finished/preempted run must not block on (and consume)
                # one more decoded+uploaded batch. The flag is made
                # process-UNIFORM on multi-host (utils/failure.py) AND
                # the stop STEP is agreed explicitly: the orbax save
                # below is a cross-process collective, and processes
                # observe the flag up to one dispatch window apart — a
                # process stopping one step before its peer leaves the
                # peer's last psum incomplete, hanging its pre-save
                # device_get (utils/failure.py::agreed_stop_step).
                if stop_step is None and shutdown.requested_uniform():
                    if jax.process_count() == 1:
                        proposal = step_idx  # stop immediately
                    else:
                        # one more dispatch window: the same deterministic
                        # schedule on every process, so the winning
                        # proposal lands on a boundary everyone reaches
                        proposal = step_idx + (
                            macro_k
                            if macro_k > 1
                            and total_steps - step_idx >= macro_k
                            else 1
                        )
                    stop_step = shutdown.agreed_stop_step(proposal)
                if stop_step is not None and step_idx >= stop_step:
                    # Preemption / interrupt: persist the full state and
                    # leave cleanly (the reference would lose up to 6000
                    # steps here — SURVEY.md §5).
                    preempted = True
                    _checked_save("norm")
                    self.checkpointer.wait()
                    break
                batch = next(batch_it, _END)
                if batch is _END:
                    break
                arrays = self.plan.ensure_batch_sharded(batch)
                # Macro stepping: fuse K microsteps into one dispatch when
                # a full window remains; singles cover the tail.
                use_macro = macro_k > 1 and total_steps - step_idx >= macro_k
                if use_macro:
                    buf.append(arrays)
                    if len(buf) < macro_k:
                        continue
                advance = macro_k if use_macro else 1
                window_has_drop = cfg.checkpoint.snapshot_on_lr_drop and any(
                    step_idx <= s < step_idx + advance for s in lr_drop_steps
                )
                if use_macro and window_has_drop:
                    # Exact "lr" snapshots (reference deeplab.py:248): a
                    # fused window that straddles an LR drop is split into
                    # single steps so the snapshot is taken at EXACTLY the
                    # boundary step, not up to K-1 steps early. Costs K
                    # dispatches for this one window; drops are rare
                    # (3 per 40-epoch run).
                    for i, arrays_i in enumerate(buf):
                        if step_idx + i in lr_drop_steps:
                            _checked_save("lr")
                        state, metrics = self.train_step(state, arrays_i)
                    buf = []
                elif use_macro:
                    state, metrics = self.macro_step(state, tuple(buf))
                    buf = []
                else:
                    if window_has_drop:
                        _checked_save("lr")
                    state, metrics = self.train_step(state, arrays)
                prev_idx = step_idx
                n_done += advance
                step_idx += advance
                # Watchdog every dispatch, decoupled from log cadence
                # (round-2 finding: at log_every=500 a NaN burned up to
                # 500 steps before detection). Checking the PREVIOUS
                # dispatch's loss keeps the pipeline full: that result is
                # already materialized while the new dispatch runs, so
                # the scalar fetch costs wire latency, not device time.
                if prev_metrics is not None:
                    reason = watchdog.check(
                        float(jax.device_get(prev_metrics["loss"]))
                    )
                    if reason is not None:
                        raise RuntimeError(f"training unhealthy: {reason}")
                prev_metrics = metrics
                if cfg.train.log_every_steps and (
                    prev_idx // cfg.train.log_every_steps
                    < step_idx // cfg.train.log_every_steps
                ):
                    # The ONLY full device sync: fetching the scalar
                    # metrics here also drains the dispatch queue, so the
                    # window below measures true steady-state throughput
                    # (the first window additionally pays the compile).
                    m = jax.device_get(metrics)
                    if log_fn is not None:
                        now = time.time()
                        m.update(
                            step=step_idx,
                            epoch=step_idx / self.steps_per_epoch,
                            # LR of the last EXECUTED step (step_idx
                            # would report the next window's LR and place
                            # drops one log window early in the JSONL).
                            # Host-side math (optim.lr_at): calling the
                            # optax schedule eagerly dispatches to the
                            # device — a relay round trip per log and a
                            # ~12 s first-log compile that polluted the
                            # throughput window.
                            lr=lr_at(
                                cfg.optim, self.steps_per_epoch,
                                step_idx - 1,
                            ),
                            images_per_sec=(n_done - n_window)
                            * cfg.train.batch_size
                            / (now - t_window),
                        )
                        t_window, n_window = now, n_done
                        log_fn(m)
                if (
                    eval_fn is not None
                    and cfg.train.eval_every_steps
                    and prev_idx // cfg.train.eval_every_steps
                    < step_idx // cfg.train.eval_every_steps
                ):
                    score = float(eval_fn(state))
                    if log_fn is not None:
                        log_fn({"step": step_idx, "val_metric": score})
                    if score > self._best_metric:
                        self._best_metric = score
                        self.checkpointer.save(state, tag="best")
                        self._store_best_metric(score, step_idx)
                    # Eval is synchronous host work; restart the
                    # throughput window so the NEXT log's images/sec
                    # reports step throughput, not steps+eval.
                    t_window, n_window = time.time(), n_done
                if cfg.checkpoint.save_every_steps and (
                    prev_idx // cfg.checkpoint.save_every_steps
                    < step_idx // cfg.checkpoint.save_every_steps
                ):
                    _checked_save("norm")
            # A finite iterator can end mid-macro-window: flush the
            # buffered (already device-put) batches through single steps
            # so no training step is silently dropped — and neither are
            # the state-affecting cadences (the exact-boundary "lr"
            # snapshot contract, reference deeplab.py:248, and periodic
            # "norm" saves; log/eval cadences are cosmetic for a <K-step
            # tail and stay quantized to the loop). Skipped on
            # preemption — those steps re-run after resume.
            if buf and not preempted:
                for arrays in buf:
                    if step_idx >= total_steps:
                        break
                    if (
                        cfg.checkpoint.snapshot_on_lr_drop
                        and step_idx in lr_drop_steps
                    ):
                        _checked_save("lr")
                    state, metrics = self.train_step(state, arrays)
                    prev_metrics = metrics
                    n_done += 1
                    step_idx += 1
                    if cfg.checkpoint.save_every_steps and (
                        (step_idx - 1) // cfg.checkpoint.save_every_steps
                        < step_idx // cfg.checkpoint.save_every_steps
                    ):
                        _checked_save("norm")
            # Final health check: the in-loop watchdog always inspects the
            # PREVIOUS dispatch (to keep the pipeline full), so the last
            # dispatch would otherwise escape scrutiny and a NaN state
            # could be checkpointed as "norm" by the caller. prev_metrics
            # is None exactly when _checked_save already validated the
            # final dispatch. NaNs propagate through the params, so one
            # check on the final loss covers the whole tail.
            if prev_metrics is not None and not preempted:
                reason = watchdog.check(
                    float(jax.device_get(prev_metrics["loss"]))
                )
                if reason is not None:
                    raise RuntimeError(f"training unhealthy: {reason}")
        return state
