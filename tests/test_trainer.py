"""Trainer tests: optimizer semantics, LR schedule, EM training step on the
8-device fake mesh, grad-accumulation parity, semi-supervised path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from em_adapt_tpu.config import (  # noqa: E402
    EStepConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from em_adapt_tpu.models import DeepLabLargeFOV  # noqa: E402
from em_adapt_tpu.train.optim import build_optimizer, lr_schedule  # noqa: E402
from em_adapt_tpu.train.state import TrainState  # noqa: E402
from em_adapt_tpu.train.trainer import Trainer, loss_fn, make_train_step  # noqa: E402


def tiny_cfg(**kw):
    """A miniature experiment that still exercises every code path."""
    defaults = dict(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        estep=EStepConfig(num_iter=2),
        optim=OptimConfig(accum_steps=2, lr_schedule=((2, 1e-4),)),
        train=TrainConfig(batch_size=8, epochs=2, seed=0),
        mesh=MeshConfig(),
    )
    defaults.update(kw)
    return ExperimentConfig(**defaults)


def tiny_batch(rng, b=8, hw=33, c=4):
    img = rng.normal(size=(b, hw, hw, 3)).astype(np.float32) * 20
    label = rng.integers(0, c, size=(b, hw, hw, 1)).astype(np.float32)
    label[:, :4] = 255.0
    return {"image": img, "label": label}


def test_lr_schedule_matches_reference_drops():
    cfg = OptimConfig()  # 1e-3, drops at epochs 10/20/30
    sched = lr_schedule(cfg, steps_per_epoch=100)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(999)) == pytest.approx(1e-3)
    assert float(sched(1000)) == pytest.approx(1e-4)
    assert float(sched(2000)) == pytest.approx(1e-5)
    assert float(sched(3000)) == pytest.approx(1e-6, rel=1e-4)


def test_lr_schedule_unsorted_override_applies_configured_values():
    """The boundary scale chain is order-sensitive; an unsorted user
    override like ((20,1e-5),(10,1e-4)) must still APPLY the configured
    LRs (regression: the chain was built in given order, silently running
    10x the configured LR between the drops while the host-side log
    showed the right value)."""
    cfg = OptimConfig(base_lr=1e-3, lr_schedule=((20, 1e-5), (10, 1e-4)))
    sched = lr_schedule(cfg, steps_per_epoch=10)
    assert float(sched(50)) == pytest.approx(1e-3, rel=1e-6)
    assert float(sched(150)) == pytest.approx(1e-4, rel=1e-6)
    assert float(sched(250)) == pytest.approx(1e-5, rel=1e-6)


def test_lr_host_matches_optax():
    """optim.lr_at (host-side, used by the train-loop log records) must
    agree with the optax schedule at every step, including the exact
    boundary steps (optax applies a boundary's value from count >=
    boundary)."""
    from em_adapt_tpu.train.optim import lr_at

    cfg = OptimConfig()  # drops at epochs 10/20/30
    sched = lr_schedule(cfg, steps_per_epoch=7)
    for step in list(range(0, 250, 13)) + [69, 70, 71, 139, 140, 141, 210]:
        assert lr_at(cfg, 7, step) == pytest.approx(
            float(sched(step)), rel=1e-6
        ), step
    # empty schedule (rehearsals run constant LR)
    cfg2 = OptimConfig(lr_schedule=())
    assert lr_at(cfg2, 7, 123) == pytest.approx(cfg2.base_lr)


def test_lr_drop_fires_at_right_microstep_inside_multisteps():
    """Regression: with the schedule inside MultiSteps, a drop at microbatch
    step S must affect the accumulated update emitted at/after S — not
    accum_steps*S. Drop at microstep 2, accum 2: the emit at microstep 1
    uses lr 1.0, the emit at microstep 3 uses the dropped lr 0.1."""
    cfg = OptimConfig(base_lr=1.0, momentum=0.0, accum_steps=2,
                      lr_schedule=((2, 0.1),))
    tx, sched = build_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.zeros(1)}
    state = tx.init(params)
    g = {"w": jnp.ones(1)}
    updates = []
    for _ in range(4):
        u, state = tx.update(g, state, params)
        updates.append(float(u["w"][0]))
    assert updates == pytest.approx([0.0, -1.0, 0.0, -0.1])
    # the microbatch-indexed schedule (used for logging) agrees
    assert float(sched(1)) == pytest.approx(1.0)
    assert float(sched(3)) == pytest.approx(0.1)


def test_lr_drops_fire_with_reference_recipe_accumulation():
    """The reference recipe (drops at epochs 10/20/30, accum 5) must drop
    three times over 40 epochs when run through the real optimizer."""
    steps_per_epoch = 10
    cfg = OptimConfig(accum_steps=5, momentum=0.0)
    tx, _ = build_optimizer(cfg, steps_per_epoch)
    params = {"w": jnp.zeros(1)}
    state = tx.init(params)
    g = {"w": jnp.ones(1)}
    emitted = []
    for _ in range(40 * steps_per_epoch):
        u, state = tx.update(g, state, params)
        v = float(u["w"][0])
        if v != 0.0:
            emitted.append(v)
    lrs = sorted({round(-v, 10) for v in emitted}, reverse=True)
    assert lrs == pytest.approx([1e-3, 1e-4, 1e-5, 1e-6])


def test_sgd_momentum_matches_tf_semantics():
    """accum = m*accum + g; var -= lr*accum (MomentumOptimizer)."""
    tx, _ = build_optimizer(
        OptimConfig(base_lr=0.1, momentum=0.9, accum_steps=1, lr_schedule=()), 1
    )
    params = {"a": {"w": jnp.ones(3), "b": jnp.zeros(3)}}
    state = tx.init(params)
    g = {"a": {"w": jnp.full(3, 2.0), "b": jnp.full(3, 1.0)}}
    # two identical grads: accum1=2 -> upd -0.2; accum2=0.9*2+2=3.8 -> -0.38
    u1, state = tx.update(g, state, params)
    u2, state = tx.update(g, state, params)
    np.testing.assert_allclose(np.asarray(u1["a"]["w"]), -0.2, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u2["a"]["w"]), -0.38, rtol=1e-6)


def test_lr_multipliers_groups():
    cfg = OptimConfig(base_lr=1.0, momentum=0.0, accum_steps=1, lr_schedule=(), lr_multipliers=True)
    tx, _ = build_optimizer(cfg, 1)
    params = {
        "conv1_1": {"w": jnp.ones(1), "b": jnp.ones(1)},
        "fc8": {"w": jnp.ones(1), "b": jnp.ones(1)},
    }
    state = tx.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, _ = tx.update(g, state, params)
    assert float(u["conv1_1"]["w"][0]) == pytest.approx(-1.0)
    assert float(u["conv1_1"]["b"][0]) == pytest.approx(-2.0)
    assert float(u["fc8"]["w"][0]) == pytest.approx(-10.0)
    assert float(u["fc8"]["b"][0]) == pytest.approx(-20.0)


def test_accumulation_matches_manual_mean():
    """MultiSteps(k): params move only every k-th step, by the mean grad."""
    opt_cfg = OptimConfig(base_lr=0.5, momentum=0.0, accum_steps=2, lr_schedule=())
    tx, _ = build_optimizer(opt_cfg, 1)
    params = {"w": jnp.zeros(2)}
    state = tx.init(params)
    g1, g2 = {"w": jnp.array([1.0, 0.0])}, {"w": jnp.array([3.0, 2.0])}
    u1, state = tx.update(g1, state, params)
    np.testing.assert_allclose(np.asarray(u1["w"]), 0.0)
    u2, state = tx.update(g2, state, params)
    np.testing.assert_allclose(np.asarray(u2["w"]), -0.5 * np.array([2.0, 1.0]))


def test_folded_batch_matches_accumulation(rng):
    """Folding gradient accumulation into one larger per-step batch
    (the reference's batch 6 x accum 5 -> one batch-30 step, reference
    deeplab.py:202-205, :288 — the tpu-perf-fold preset / bench.py
    default) is the SAME optimization trajectory: the CE loss is a mean
    over B*h*w pixels, so the batch-2k mean equals the mean of two
    batch-k microbatch means; the weight-decay gradient, momentum
    recursion and epoch-indexed LR schedule are per-update identical
    (epoch boundaries land on the same DATA position because
    steps_per_epoch scales inversely with batch size).

    Verified END TO END through the real jitted train_step at
    batch 8 x accum 2 == batch 16 x accum 1 over 3 applied updates with
    an LR drop mid-run (pins the MultiSteps schedule re-indexing), with
    dropout off (an RNG-granularity knob the reference never pinned) and
    DETERMINISTIC training targets (the semi-supervised strong path:
    true downsampled masks, every pixel valid). Deterministic targets
    rather than the E-step's: XLA lowers a convolution differently at
    different batch sizes (different reduction tiling), so per-image
    logits drift by float ulps between the two executions — and the
    E-step's rank-k bias constructs an EXACT score tie at the rank
    boundary pixel (score_j + (max - score_j) vs max, reference
    estep.py:73-79), whose argmax resolution decoheres under ulp noise.
    That tie sensitivity is the reference's own (np.partition boundary),
    not a fold artifact; test_estep_labels_batch_independent pins that
    GIVEN the same logits the E-step targets are identical per image
    regardless of batch composition. Together: the fold preserves the
    update math exactly (the optimizer chain alone folds BIT-exactly —
    verified while building this test), and the only residual is float
    rounding: conv reduction-order ulps in the grads plus param-ulp
    re-rounding of p + u — the same noise floor as changing XLA
    versions.
    """
    n_images, hw, c = 48, 33, 4
    imgs = rng.normal(size=(n_images, hw, hw, 3)).astype(np.float32) * 20
    labels = (
        rng.integers(0, c, size=(n_images, hw, hw, 1)).astype(np.float32)
    )  # all pixels valid -> per-image CE denominators equal

    def build(batch, accum, spe):
        cfg = tiny_cfg(
            model=ModelConfig(
                num_classes=c, input_size=(hw, hw), fc6_channels=8,
                dropout_keep_prob=1.0, init_scheme="he",
            ),
            optim=OptimConfig(accum_steps=accum, lr_schedule=((1, 1e-4),)),
            train=TrainConfig(batch_size=batch, epochs=3, seed=0,
                              donate_state=False),
            semi_supervised=True,
        )
        return Trainer(cfg, steps_per_epoch=spe)

    tr_micro = build(8, accum=2, spe=4)    # epoch = 32 images
    tr_fold = build(16, accum=1, spe=2)    # epoch = 32 images

    s_micro = tr_micro.init_state()
    s_fold = tr_fold.init_state()
    p0 = jax.device_get(s_micro.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p0, jax.device_get(s_fold.params),
    )

    def batch_slice(lo, hi):
        return {
            "image": imgs[lo:hi],
            "label": labels[lo:hi],
            "is_strong": np.ones(hi - lo, bool),
        }

    for k in range(6):  # 3 applied updates; LR drop before update 2
        b = tr_micro.plan.shard_batch(batch_slice(8 * k, 8 * (k + 1)))
        s_micro, _ = tr_micro.train_step(s_micro, b)
    for k in range(3):
        b = tr_fold.plan.shard_batch(batch_slice(16 * k, 16 * (k + 1)))
        s_fold, _ = tr_fold.train_step(s_fold, b)

    # Compare the parameter DELTAS (what training did), not the params —
    # init dominates the params and would make any tolerance vacuous.
    # Tolerance floor = f32 ulps of the PARAMETER magnitude: the per-update
    # step is ~1e-5 of the weights here, so each of the 3 updates re-rounds
    # p + u at the param's quantization step and the two trajectories land
    # within a few param-ulps of each other (measured ≤ 8); the delta-
    # proportional term covers conv reduction-order grad noise, which
    # dominates for the zero-init biases (param-ulp 0): measured 0.2-0.8%
    # of the delta across reruns on this host, bounded at 2% — still an
    # order of magnitude below any real trajectory difference.
    eps32 = float(np.finfo(np.float32).eps)

    def check(path, a, b, init):
        init = np.asarray(init)
        da = np.asarray(a) - init
        db = np.asarray(b) - init
        name = jax.tree_util.keystr(path)
        assert np.abs(db).max() > 0, f"no update reached {name}"
        tol = 64 * eps32 * np.abs(init).max() + 2e-2 * np.abs(db).max()
        worst = np.abs(da - db).max()
        assert worst <= tol, (
            f"param delta diverged at {name}: max|d_micro-d_fold|={worst:.3e} "
            f"> tol {tol:.3e} (max|delta|={np.abs(db).max():.3e})"
        )

    jax.tree_util.tree_map_with_path(
        check, jax.device_get(s_micro.params), jax.device_get(s_fold.params), p0
    )


def test_fold_not_equivalent_for_strong_path_with_voids(rng):
    """The fold-equivalence claim is scoped to the WEAK-supervision
    recipe. The semi-supervised strong path normalizes its CE by the
    batch's valid (non-255) pixel count (loss_fn's ``denom``), so when
    microbatches carry DIFFERENT void counts the batch-2k loss is a
    valid-pixel-weighted mean — not the mean of the two batch-k losses —
    and folding changes the update. This pins the divergence the CLI
    warns about (tpu-perf-fold + --strong-list), so it can't silently
    regress into an unscoped 'same update math' claim."""
    hw, c = 33, 4
    cfg = tiny_cfg(
        model=ModelConfig(num_classes=c, input_size=(hw, hw),
                          fc6_channels=8, dropout_keep_prob=1.0,
                          init_scheme="he"),
        semi_supervised=True,
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    rng_key = jax.random.key(1)

    imgs = rng.normal(size=(2, hw, hw, 3)).astype(np.float32) * 20
    labels = rng.integers(0, c, size=(2, hw, hw, 1)).astype(np.float32)
    labels[0, : hw // 2] = 255.0  # image 0: ~half void; image 1: none

    def loss_of(sel):
        batch = {
            "image": jnp.asarray(imgs[sel]),
            "label": jnp.asarray(labels[sel]),
            "is_strong": jnp.ones(len(sel), bool),
        }
        total, _ = loss_fn(params, batch, rng_key, model, cfg)
        return float(total)

    l0, l1, l_fold = loss_of([0]), loss_of([1]), loss_of([0, 1])
    accum_mean = (l0 + l1) / 2
    # Structural divergence, far above conv reduction-order ulps: the
    # folded loss weights image 1's pixels ~2x image 0's.
    assert abs(l_fold - accum_mean) > 1e-4 * abs(accum_mean), (
        l0, l1, l_fold,
    )
    # Control: with NO voids the fold IS the mean (float tolerance) —
    # the weak-recipe equivalence that test_folded_batch_matches_
    # accumulation pins end to end.
    labels[0] = np.abs(labels[0]) % c
    l0, l1, l_fold = loss_of([0]), loss_of([1]), loss_of([0, 1])
    np.testing.assert_allclose(l_fold, (l0 + l1) / 2, rtol=1e-5)


def test_estep_labels_batch_independent(rng):
    """GIVEN the same per-image score maps, the E-step's weak labels do
    not depend on which other images share the batch — the fold's second
    leg (see test_folded_batch_matches_accumulation). The bias thresholds
    (rank-k over each image's own diffs, reference estep.py:73-79) and
    re-centering (per-image means, estep.py:81-82) are strictly
    per-image; suppress_others couples images only through the global
    batch max (estep.py:49), a shift whose purpose (push absent classes
    above the present-class min) is composition-independent whenever it
    dominates — as it does for real score maps; pinned here for both
    suppress settings.
    """
    from em_adapt_tpu.ops.estep import estep_labels, make_class_orders

    b, hw, c = 16, 9, 6
    scores = jnp.asarray(rng.normal(size=(b, hw, hw, c)).astype(np.float32))
    # Two fg classes per image (varying across images) so absent classes
    # exist and the suppress_others branch actually engages.
    slot = rng.integers(0, 3, size=(b, hw, hw))
    lab = np.zeros((b, hw, hw), np.float32)
    for i in range(b):
        cls = np.array([0, 1 + i % (c - 1), 1 + (i + 2) % (c - 1)], np.float32)
        lab[i] = cls[slot[i]]
    labels = jnp.asarray(lab)
    orders = make_class_orders(jax.random.key(3), 2, c)
    for suppress in (True, False):
        cfg = EStepConfig(num_iter=2, suppress_others=suppress)
        full = np.asarray(estep_labels(scores, labels, orders, cfg))
        for lo in (0, 8):
            half = np.asarray(
                estep_labels(
                    scores[lo: lo + 8], labels[lo: lo + 8], orders, cfg
                )
            )
            np.testing.assert_array_equal(half, full[lo: lo + 8])


def test_train_step_decreases_loss_on_mesh(rng):
    """Full jitted EM step over the 8-device fake mesh: loss falls."""
    cfg = tiny_cfg()
    trainer = Trainer(cfg, steps_per_epoch=4)
    assert trainer.plan.num_data_shards == 8
    state = trainer.init_state()
    batch = tiny_batch(rng)
    losses = []
    for _ in range(12):
        state, metrics = trainer.train_step(state, trainer.plan.shard_batch(batch))
        losses.append(float(jax.device_get(metrics["loss"])))
    assert losses[-1] < losses[0], losses
    assert int(jax.device_get(state.step)) == 12


def test_loss_fn_gradients_dont_flow_through_estep(rng):
    """EM semantics: the E-step target is constant w.r.t. params
    (reference deeplab.py:120 wraps the py_func output — no gradient).
    Pinned directly: grad of ANY scalar function of the E-step target
    w.r.t. params is exactly zero (zero-cotangent property — would catch
    a refactor to soft/float targets that leaks the bias path), the
    target dtype is integer, and the full loss still has finite,
    nonzero grads through the logits path."""
    from em_adapt_tpu.ops.estep import estep_labels, make_class_orders
    from em_adapt_tpu.ops.resize import resize_nearest_tf

    cfg = tiny_cfg()
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, tiny_batch(rng))
    drop_rng, order_rng = jax.random.split(jax.random.key(1))
    orders = make_class_orders(order_rng, cfg.estep.num_iter,
                               cfg.model.num_classes)

    def target_mean(p):
        logits = model.apply(p, batch["image"], train=True, rng=drop_rng)
        shrunk = resize_nearest_tf(
            batch["label"], (logits.shape[1], logits.shape[2])
        )[..., 0]
        weak = estep_labels(logits, shrunk, orders, cfg.estep)
        assert jnp.issubdtype(weak.dtype, jnp.integer), weak.dtype
        return jnp.mean(weak.astype(jnp.float32))

    target_grads = jax.grad(target_mean)(params)
    assert all(
        float(jnp.abs(g).max()) == 0.0 for g in jax.tree.leaves(target_grads)
    ), "E-step target leaked a gradient back to params"

    (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, batch, jax.random.key(1), model, cfg
    )
    leaves = jax.tree.leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
    assert float(metrics["loss_l2"]) > 0


def test_semi_supervised_masks_void(rng):
    cfg = tiny_cfg(semi_supervised=True)
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    batch = tiny_batch(rng)
    batch["is_strong"] = np.array([True] * 4 + [False] * 4)
    batch = jax.tree.map(jnp.asarray, batch)
    total, metrics = loss_fn(params, batch, jax.random.key(1), model, cfg)
    assert np.isfinite(float(total))

    # All-void strong image must not produce NaN.
    b2 = dict(batch)
    b2["label"] = jnp.full_like(batch["label"], 255.0)
    b2["is_strong"] = jnp.ones(8, bool)
    total2, _ = loss_fn(params, b2, jax.random.key(1), model, cfg)
    assert np.isfinite(float(total2))


def test_macro_step_matches_single_stepping(rng):
    """macro_steps=K (lax.scan fused dispatch) must follow the same
    training trajectory as K single steps (same RNG folding on state.step,
    same MultiSteps accumulation) — to float tolerance: XLA fuses the scan
    body differently, so reduction orders differ slightly."""
    cfg = tiny_cfg(
        train=TrainConfig(batch_size=8, epochs=2, seed=0, macro_steps=2,
                          donate_state=False),
        optim=OptimConfig(accum_steps=2, lr_schedule=()),
    )
    trainer = Trainer(cfg, steps_per_epoch=4)
    assert trainer.macro_step is not None
    state0 = trainer.init_state()
    batches = [
        jax.tree.map(jnp.asarray, tiny_batch(np.random.default_rng(i)))
        for i in range(4)
    ]
    sharded = [trainer.plan.shard_batch(b) for b in batches]

    s_single = state0
    for b in sharded:
        s_single, m_single = trainer.train_step(s_single, b)

    s_macro = state0
    for pair in (tuple(sharded[:2]), tuple(sharded[2:])):
        s_macro, m_macro = trainer.macro_step(s_macro, pair)

    assert int(jax.device_get(s_macro.step)) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-8
        ),
        s_single.params,
        s_macro.params,
    )
    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_macro["loss"]), rtol=1e-6
    )


def test_tag_warmup_selects_classification_loss(rng):
    """tag_warmup_steps trains steps < N on the weak-tag classification
    loss: loss_norm equals the hand-computed LSE-pooled sigmoid BCE vs
    the label-smoothed image-level tags (255 ignore dropped), and from
    step N on the EM objective is back bit-exactly (same value as a
    warmup-off config)."""
    from em_adapt_tpu.ops.resize import resize_nearest_tf

    cfg = tiny_cfg(
        train=TrainConfig(batch_size=8, epochs=2, seed=0, tag_warmup_steps=3)
    )
    cfg_off = tiny_cfg()
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, tiny_batch(np.random.default_rng(0)))
    key = jax.random.key(1)

    total_w, metrics_w = loss_fn(
        params, batch, key, model, cfg, step=jnp.asarray(0)
    )
    # Reproduce the logits with loss_fn's own rng split, then the tag BCE
    # by hand in numpy.
    drop_rng, _ = jax.random.split(key)
    logits = model.apply(params, batch["image"], train=True, rng=drop_rng)
    shrunk = resize_nearest_tf(batch["label"], logits.shape[1:3])[..., 0]
    lab = np.asarray(shrunk).astype(np.int64)
    b, h, w, c = logits.shape
    tags = np.zeros((b, c), np.float32)
    for i in range(b):
        present = np.unique(lab[i])
        tags[i, present[present < c]] = 1.0
    eps = cfg.train.tag_warmup_smoothing
    tags = tags * (1.0 - 2.0 * eps) + eps
    r = cfg.train.tag_warmup_pool_r
    pooled = (
        np.asarray(jax.nn.logsumexp(r * logits.reshape(b, h * w, c), axis=1))
        - np.log(float(h * w))
    ) / r
    hand_bce = np.mean(np.logaddexp(0.0, pooled) - tags * pooled)
    np.testing.assert_allclose(
        float(metrics_w["loss_norm"]), hand_bce, rtol=1e-5
    )
    l2 = float(model.weight_l2(params))
    np.testing.assert_allclose(
        float(total_w), hand_bce + cfg.optim.weight_decay * l2, rtol=1e-5
    )

    # past the threshold the EM objective is selected, matching warmup-off
    total_e, _ = loss_fn(params, batch, key, model, cfg, step=jnp.asarray(3))
    total_off, _ = loss_fn(
        params, batch, key, model, cfg_off, step=jnp.asarray(3)
    )
    assert float(total_e) == float(total_off)
    assert not np.isclose(float(total_w), float(total_e))


def test_tag_warmup_smoothing_bounds_the_objective():
    """Label smoothing gives the warmup BCE a finite minimizer: with hard
    targets the loss keeps falling as logits grow (the divergence that
    NaN'd a he-init probe mid-warmup), with smoothed targets the loss
    turns back up past pooled logit = logit(1-eps) — growing logits are
    PENALIZED, so the warmup race has a finite attractor."""
    from em_adapt_tpu.train.trainer import tag_classification_loss

    rng = np.random.default_rng(0)
    base = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32))
    lab = jnp.asarray(rng.integers(0, 3, size=(2, 4, 4)).astype(np.int32))
    scales = [1.0, 10.0, 100.0]
    hard = [float(tag_classification_loss(base * s, lab, 3, 0.0))
            for s in scales]
    smooth = [float(tag_classification_loss(base * s, lab, 3, 0.05))
              for s in scales]
    assert hard[2] < hard[1] < hard[0]          # runs away forever
    assert smooth[2] > smooth[1]                # turned back up: bounded
    # at eps=0.05 the optimum is |pooled| = logit(0.95) ~ 2.94; a logit
    # blowup to scale 100 costs ~ eps * |pooled| per present class
    assert smooth[2] > smooth[0]


def test_tag_warmup_pool_r_rejects_constant_maps():
    """The pooling-sharpness property the warmup relies on: a spatially
    CONSTANT map pools to its value for every r (so at r=1 the mean-like
    pool is satisfied by constant maps — no spatial discrimination),
    while for a PEAKED map the pool approaches the peak as r grows — so
    under sharp pooling a present-class target is reachable by a peak
    alone, the spatially-discriminative solution."""
    from em_adapt_tpu.train.trainer import tag_classification_loss

    h = w = 8
    lab = jnp.zeros((1, h, w), jnp.int32)  # class 0 present, class 1 absent
    const = jnp.full((1, h, w, 2), jnp.asarray([3.0, -3.0]))
    peak = jnp.full((1, h, w, 2), -3.0)
    # one class-0 peak at the smoothed-BCE optimum height (~logit(0.95));
    # taller peaks are penalized by the smoothing, by design
    peak = peak.at[0, 4, 4, 0].set(3.0)

    # constant maps: pooled == value, loss identical at every sharpness
    l_const = [float(tag_classification_loss(const, lab, 2, 0.05, r))
               for r in (1.0, 4.0, 16.0)]
    np.testing.assert_allclose(l_const, l_const[0], rtol=1e-5)

    # peaked map: mean-like pooling washes the peak out (high BCE);
    # sharp pooling sees it (loss approaches the constant-map optimum)
    l_peak_1 = float(tag_classification_loss(peak, lab, 2, 0.05, 1.0))
    l_peak_16 = float(tag_classification_loss(peak, lab, 2, 0.05, 16.0))
    assert l_peak_16 < l_peak_1
    assert l_peak_16 < l_const[0] + 0.5


def test_tag_warmup_boundary_inside_macro_window(rng):
    """The warmup->EM switch is a traced select on state.step, so ONE
    macro window straddling the boundary (steps 0-1 warmup, 2-3 EM with
    tag_warmup_steps=2, K=4) must follow the same trajectory as single
    stepping — no window splitting needed."""
    cfg_single = tiny_cfg(
        train=TrainConfig(batch_size=8, epochs=2, seed=0,
                          tag_warmup_steps=2, donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
    )
    cfg_macro = tiny_cfg(
        train=TrainConfig(batch_size=8, epochs=2, seed=0,
                          tag_warmup_steps=2, macro_steps=4,
                          donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
    )
    tr_s = Trainer(cfg_single, steps_per_epoch=4)
    tr_m = Trainer(cfg_macro, steps_per_epoch=4)
    state0 = tr_s.init_state()
    batches = [
        jax.tree.map(jnp.asarray, tiny_batch(np.random.default_rng(i)))
        for i in range(4)
    ]
    sharded = [tr_s.plan.shard_batch(b) for b in batches]

    s_single = state0
    for b in sharded:
        s_single, _ = tr_s.train_step(s_single, b)

    s_macro, _ = tr_m.macro_step(state0, tuple(sharded))
    assert int(jax.device_get(s_macro.step)) == 4
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-8
        ),
        s_single.params,
        s_macro.params,
    )


def test_fit_with_macro_steps(rng, tmp_path):
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=4, async_save=False
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, log_every_steps=2,
                          macro_steps=2),
        optim=OptimConfig(accum_steps=2, lr_schedule=((1, 1e-4),)),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    logs = []
    state = trainer.fit(state, (tiny_batch(rng) for _ in range(10)),
                        log_fn=logs.append)
    assert int(jax.device_get(state.step)) == 6
    assert logs and any("loss" in m for m in logs)
    # cadence still fires on crossings (save_every=4 crossed at step 4)
    assert trainer.checkpointer.latest_step("norm") == 4
    # lr snapshot at EXACTLY the epoch-1 boundary (step 3, inside a
    # macro window — the window is split so the snapshot is not early)
    assert trainer.checkpointer.latest_step("lr") == 3
    trainer.checkpointer.close()


def test_trainer_fit_loop(rng, tmp_path):
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=4, async_save=False
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, log_every_steps=2),
        optim=OptimConfig(accum_steps=2, lr_schedule=((1, 1e-4),)),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    logs = []
    batches = (tiny_batch(rng) for _ in range(10))
    state = trainer.fit(state, batches, log_fn=logs.append)
    assert int(jax.device_get(state.step)) == 6  # epochs * steps_per_epoch
    assert logs and {"loss", "lr", "epoch", "images_per_sec"} <= set(logs[0])
    assert trainer.checkpointer.latest_step("norm") == 4
    # lr snapshot at the epoch-1 boundary (tiny schedule drops at epoch 1)
    assert trainer.checkpointer.latest_step("lr") == 3
    trainer.checkpointer.close()


def test_fit_returns_when_iterator_exhausts(rng, tmp_path):
    """A finite batch iterator that ends before num_steps must terminate
    fit (regression: the prefetcher dropped its end sentinel when the
    queue was full -> fit hung in get() forever), and with macro_steps a
    partial tail window must still be trained, not silently dropped."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=10**6,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=100, seed=0,
                          log_every_steps=10**6, macro_steps=2),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
    )
    trainer = Trainer(cfg, steps_per_epoch=1000)
    state = trainer.init_state()
    batches = (tiny_batch(rng) for _ in range(5))  # exhausts mid-window
    state = trainer.fit(state, batches, num_steps=20)
    # 2 macro windows (4 steps) + 1 flushed tail step = 5
    assert int(jax.device_get(state.step)) == 5
    trainer.checkpointer.close()


def test_restore_state_roundtrip(rng, tmp_path):
    """restore_state materializes the FULL state (params + MultiSteps
    accumulators + momentum + step + PRNG key) straight onto the mesh —
    resuming mid-accumulation-window must continue the same trajectory."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=3, async_save=False
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, donate_state=False,
                          rng_impl="rbg"),
        optim=OptimConfig(accum_steps=2, lr_schedule=()),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    batches = [
        trainer.plan.shard_batch(
            {k: jnp.asarray(v) for k, v in tiny_batch(np.random.default_rng(i)).items()}
        )
        for i in range(5)
    ]
    # 3 steps (ends MID-accumulation window), checkpoint, 2 more steps.
    for b in batches[:3]:
        state, _ = trainer.train_step(state, b)
    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.wait()
    for b in batches[3:]:
        state, _ = trainer.train_step(state, b)
    want = jax.device_get(state.params)

    # Fresh trainer restores and replays the same two steps.
    trainer2 = Trainer(cfg, steps_per_epoch=3)
    restored = trainer2.restore_state()
    assert int(jax.device_get(restored.step)) == 3
    for b in batches[3:]:
        restored, _ = trainer2.train_step(restored, b)
    got = jax.device_get(restored.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        want, got,
    )
    trainer.checkpointer.close()
    trainer2.checkpointer.close()


def test_fit_periodic_eval_saves_best(rng, tmp_path):
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=10**6, async_save=False
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, log_every_steps=100,
                          eval_every_steps=2),
        optim=OptimConfig(accum_steps=2, lr_schedule=()),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    scores = iter([0.1, 0.3, 0.2])  # improves, improves, regresses

    state = trainer.fit(
        state,
        (tiny_batch(rng) for _ in range(10)),
        eval_fn=lambda s: next(scores),
    )
    # best saved at steps 2 and 4 (improvements), not at 6
    assert trainer.checkpointer.latest_step("best") == 4
    trainer.checkpointer.close()


def test_best_metric_survives_trainer_restart(rng, tmp_path):
    """A RESUMED run must not let its first (possibly worse) eval
    overwrite the 'best' checkpoint lineage: the best-so-far score
    persists in a sidecar JSON and is inherited when fit() starts from a
    restored (step > 0) state. A FRESH run (step 0) in the same save_dir
    is a new lineage and must NOT inherit."""
    import json
    import os

    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=10**6,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, log_every_steps=100,
                          eval_every_steps=2),
        optim=OptimConfig(accum_steps=2, lr_schedule=()),
    )
    side_path = os.path.join(str(tmp_path / "saver"), "best_metric.json")
    trainer = Trainer(cfg, steps_per_epoch=3)
    trainer.fit(
        trainer.init_state(),
        (tiny_batch(rng) for _ in range(6)),
        eval_fn=lambda s, it=iter([0.1, 0.5, 0.2]): next(it),
    )
    assert trainer.checkpointer.latest_step("best") == 4
    side = json.load(open(side_path))
    assert side["metric"] == 0.5 and side["step"] == 4
    trainer.checkpointer.close()

    # RESUME (restored state, step 4 > 0): inherits best=0.5, so the
    # post-resume eval scoring 0.3 must NOT create a new "best".
    trainer2 = Trainer(cfg, steps_per_epoch=3)
    state = trainer2.restore_state(tag="best")  # step 4
    trainer2.fit(
        state,
        (tiny_batch(rng) for _ in range(6)),
        eval_fn=lambda s, it=iter([0.3]): next(it),
    )
    assert trainer2.checkpointer.latest_step("best") == 4  # unchanged
    assert json.load(open(side_path))["metric"] == 0.5
    trainer2.checkpointer.close()

    # Resume again, now beating the stored best: 0.9 must win.
    trainer3 = Trainer(cfg, steps_per_epoch=3)
    state = trainer3.restore_state(tag="best")
    trainer3.fit(
        state,
        (tiny_batch(rng) for _ in range(6)),
        eval_fn=lambda s, it=iter([0.9]): next(it),
    )
    assert trainer3.checkpointer.latest_step("best") == 6
    assert json.load(open(side_path))["metric"] == 0.9
    trainer3.checkpointer.close()

    # FRESH lineage (step 0) in the same dir: does NOT inherit 0.9 — its
    # own first eval becomes its best (and overwrites the sidecar).
    trainer4 = Trainer(cfg, steps_per_epoch=3)
    trainer4.fit(
        trainer4.init_state(),
        (tiny_batch(rng) for _ in range(6)),
        eval_fn=lambda s, it=iter([0.2, 0.05, 0.01]): next(it),
    )
    assert json.load(open(side_path))["metric"] == 0.2

    # Second fit() on the SAME Trainer instance with a fresh (step-0)
    # state: also a new lineage — the instance must not carry the
    # previous run's best across fit() calls (review finding: the stale
    # _best_metric suppressed every "best" save of the new run).
    trainer4.fit(
        trainer4.init_state(),
        (tiny_batch(rng) for _ in range(6)),
        eval_fn=lambda s, it=iter([0.15, 0.02, 0.01]): next(it),
    )
    assert json.load(open(side_path))["metric"] == 0.15
    trainer4.checkpointer.close()


def test_checkpoint_duplicate_step_save_is_noop(rng, tmp_path):
    """Saving the same step twice under one tag (preemption signal right
    after a cadence save; final save on a cadence boundary) must not
    raise orbax's StepAlreadyExistsError."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=10**6,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    b = trainer.plan.shard_batch(
        {k: jnp.asarray(v) for k, v in tiny_batch(rng).items()}
    )
    state, _ = trainer.train_step(state, b)
    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.save(state, tag="norm")  # must be a silent no-op
    trainer.checkpointer.wait()
    assert trainer.checkpointer.latest_step("norm") == 1
    trainer.checkpointer.close()


def test_warm_start_params_only(rng, tmp_path):
    """--warm-start semantics (reference model_path, deeplab.py:229-234):
    parameters come from the checkpoint; optimizer slots, step counter,
    LR schedule and RNG stream are FRESH."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=10**6,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=((1, 1e-4),)),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    b = trainer.plan.shard_batch(
        {k: jnp.asarray(v) for k, v in tiny_batch(rng).items()}
    )
    for _ in range(3):  # momentum slots become nonzero, step=3
        state, _ = trainer.train_step(state, b)
    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.wait()
    trained_params = jax.device_get(state.params)

    # Second run in a fresh directory warm-starts from the first.
    trainer2 = Trainer(cfg.replace(
        checkpoint=cfg.checkpoint.__class__(
            save_dir=str(tmp_path / "saver2"), save_every_steps=10**6,
            async_save=False,
        )
    ), steps_per_epoch=3)
    fresh = trainer2.init_state()
    warm = trainer2.warm_start(fresh, str(tmp_path / "saver"))
    # params == the checkpoint's trained params
    jax.tree.map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        jax.device_get(warm.params), trained_params,
    )
    # step restarts at 0 and the optimizer slots are zeroed (fresh)
    assert int(jax.device_get(warm.step)) == 0
    fresh_slots = jax.device_get(fresh.opt_state)
    warm_slots = jax.device_get(warm.opt_state)
    jax.tree.map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        warm_slots, fresh_slots,
    )
    # the LR schedule restarts from the top: the first warm step uses
    # base_lr (the original run is already past the epoch-1 drop)
    assert float(trainer2.sched(0)) == pytest.approx(1e-3)
    warm, m = trainer2.train_step(warm, b)
    assert np.isfinite(float(jax.device_get(m["loss"])))
    assert int(jax.device_get(warm.step)) == 1
    trainer.checkpointer.close()
    trainer2.checkpointer.close()


def test_warm_start_across_optimizer_change(rng, tmp_path):
    """Round-3 review finding: --warm-start must work when the NEW run's
    optimizer config differs from the checkpointed run's (reference
    model_path loads weights into a fresh session regardless of the
    optimizer, deeplab.py:229-234). Changing accum_steps changes the
    MultiSteps opt_state tree, so the template-driven restore fails and
    the params-only fallback (CheckpointManager.restore_saved) must
    graft the weights instead."""
    ckpt_cls = ExperimentConfig().checkpoint.__class__
    cfg1 = tiny_cfg(
        checkpoint=ckpt_cls(save_dir=str(tmp_path / "saver"),
                            save_every_steps=10**6, async_save=False),
        train=TrainConfig(batch_size=8, epochs=2, seed=0, donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
    )
    trainer = Trainer(cfg1, steps_per_epoch=3)
    state = trainer.init_state()
    b = trainer.plan.shard_batch(
        {k: jnp.asarray(v) for k, v in tiny_batch(rng).items()}
    )
    for _ in range(2):
        state, _ = trainer.train_step(state, b)
    trainer.checkpointer.save(state, tag="norm")
    trainer.checkpointer.wait()
    trained_params = jax.device_get(state.params)

    # New run: accum_steps 1 -> 2 reshapes the MultiSteps slots.
    cfg2 = cfg1.replace(
        optim=OptimConfig(accum_steps=2, lr_schedule=()),
        checkpoint=ckpt_cls(save_dir=str(tmp_path / "saver2"),
                            save_every_steps=10**6, async_save=False),
    )
    trainer2 = Trainer(cfg2, steps_per_epoch=3)
    fresh = trainer2.init_state()
    warm = trainer2.warm_start(fresh, str(tmp_path / "saver"))
    jax.tree.map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        jax.device_get(warm.params), trained_params,
    )
    assert int(jax.device_get(warm.step)) == 0
    # optimizer slots are the NEW config's fresh slots
    jax.tree.map(
        lambda a, c: np.testing.assert_array_equal(np.asarray(a), np.asarray(c)),
        jax.device_get(warm.opt_state), jax.device_get(fresh.opt_state),
    )
    warm, m = trainer2.train_step(warm, b)
    assert np.isfinite(float(jax.device_get(m["loss"])))
    trainer.checkpointer.close()
    trainer2.checkpointer.close()


def test_parse_warm_start_spec():
    from em_adapt_tpu.cli import _parse_warm_start

    assert _parse_warm_start("saver") == ("saver", None)
    assert _parse_warm_start("/a/b/saver:120") == ("/a/b/saver", 120)
    assert _parse_warm_start("saver:latest") == ("saver:latest", None)
    assert _parse_warm_start("saver:12x") == ("saver:12x", None)


def test_lr_snapshot_exact_under_macro10(rng, tmp_path):
    """VERDICT r2 weakness #5: with macro_steps=10 (the tpu-perf preset)
    the "lr" snapshot must land on EXACTLY the drop step, not up to 9
    steps early — the straddling window is split into single steps."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=10**6,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=4, seed=0,
                          log_every_steps=10**6, macro_steps=10),
        optim=OptimConfig(accum_steps=1, lr_schedule=((2, 1e-4),)),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)  # drop at step 6
    state = trainer.init_state()
    state = trainer.fit(state, (tiny_batch(rng) for _ in range(15)),
                        num_steps=12)
    assert int(jax.device_get(state.step)) == 12
    assert trainer.checkpointer.latest_step("lr") == 6
    trainer.checkpointer.close()


def test_fit_does_not_consume_batches_past_the_budget(rng):
    """fit must check the step budget BEFORE pulling from the iterator:
    one extra pull costs a full decode + H2D upload and steals a batch
    from any later consumer of a shared generator (review finding)."""
    cfg = tiny_cfg(
        train=TrainConfig(batch_size=8, epochs=2, seed=0, donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
        data=ExperimentConfig().data.__class__(prefetch=0),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.init_state()
    pulled = []

    def gen():
        for i in range(100):
            pulled.append(i)
            yield tiny_batch(rng)

    trainer.fit(state, gen(), num_steps=4)
    assert len(pulled) == 4, pulled


def test_zero_cadences_disable_instead_of_crash(rng, tmp_path):
    """save_every_steps=0 / log_every_steps=0 must mean 'disabled' (like
    eval_every_steps) rather than ZeroDivisionError (review finding)."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=0,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=1, seed=0,
                          log_every_steps=0, donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=()),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)
    state = trainer.fit(trainer.init_state(),
                        (tiny_batch(rng) for _ in range(3)))
    assert int(jax.device_get(state.step)) == 3
    assert trainer.checkpointer.latest_step("norm") is None  # disabled
    trainer.checkpointer.close()


def test_tail_flush_takes_lr_snapshot_and_norm_save(rng, tmp_path):
    """A finite iterator ending mid-macro-window flushes singles — the
    exact-boundary 'lr' snapshot and periodic 'norm' saves crossed by
    those tail steps must still happen (review finding)."""
    cfg = tiny_cfg(
        checkpoint=ExperimentConfig().checkpoint.__class__(
            save_dir=str(tmp_path / "saver"), save_every_steps=5,
            async_save=False,
        ),
        train=TrainConfig(batch_size=8, epochs=3, seed=0,
                          log_every_steps=10**6, macro_steps=4,
                          donate_state=False),
        optim=OptimConfig(accum_steps=1, lr_schedule=((2, 1e-4),)),
    )
    trainer = Trainer(cfg, steps_per_epoch=3)  # drop at step 6
    state = trainer.init_state()
    # 7 batches: one macro window of 4, then the iterator ends with 3
    # buffered -> tail flush runs steps 5,6,7; the drop boundary (6) and
    # the save_every boundary (5) land INSIDE the tail.
    trainer.fit(state, (tiny_batch(rng) for _ in range(7)))
    assert trainer.checkpointer.latest_step("lr") == 6
    assert trainer.checkpointer.latest_step("norm") == 5
    trainer.checkpointer.close()


def test_lr_schedule_rejects_duplicate_epochs():
    """Duplicate epoch boundaries would overwrite each other's scale and
    silently apply up to 10x the BASE lr (review finding)."""
    cfg = OptimConfig(base_lr=1e-3, lr_schedule=((10, 1e-4), (10, 1e-5)))
    with pytest.raises(ValueError, match="duplicate epoch"):
        lr_schedule(cfg, steps_per_epoch=10)


def test_config_hints_surface_measured_guidance():
    """Round-4 review: the SPATIAL.json when-to-use table and the
    EM-Fixed erosion evidence lived only in docs. config_hints surfaces
    both at Trainer construction."""
    from em_adapt_tpu.config import (
        EStepConfig,
        ExperimentConfig,
        MeshConfig,
        ModelConfig,
    )
    from em_adapt_tpu.parallel.mesh import make_mesh
    from em_adapt_tpu.train.trainer import config_hints

    def hints(cfg, n=8):
        return config_hints(cfg, make_mesh(cfg.mesh, devices=jax.devices()[:n]))

    # >=513^2 input, multi-device mesh, space=1 -> spatial hint
    big = ExperimentConfig(
        model=ModelConfig(input_size=(513, 513)),
        mesh=MeshConfig(axes=(("data", 8), ("space", 1))),
    )
    assert any("space=3" in h for h in hints(big))
    # space already partitioned -> no hint (513 isn't divisible by 2, so
    # use a 3-way space axis sized to fit the divisibility contract is
    # irrelevant here: config_hints reads the MESH, not the trace)
    spaced = big.replace(
        mesh=MeshConfig(axes=(("data", 4), ("space", 2)))
    )
    assert not any("space=3" in h for h in hints(spaced))
    # small input -> no hint
    small = ExperimentConfig(
        model=ModelConfig(input_size=(321, 321)),
        mesh=MeshConfig(axes=(("data", 8), ("space", 1))),
    )
    assert not any("space=3" in h for h in hints(small))

    # ... and a single device never hints about spatial partitioning
    single = ExperimentConfig(
        model=ModelConfig(input_size=(513, 513)),
        mesh=MeshConfig(axes=(("data", 1),)),
    )
    assert not any("space=3" in h for h in hints(single, n=1))

    # EM-Fixed with logit-unit biases -> erosion warning...
    fixed = ExperimentConfig(
        estep=EStepConfig(method="fixed"),
        mesh=MeshConfig(axes=(("data", 1),)),
    )
    assert any("CONVERGENCE_FIXED" in h for h in hints(fixed, n=1))
    # ...silenced by SYMMETRIC spread-calibrated units (the retaining
    # configuration, CONVERGENCE_FIXED.json warm_spread) or adaptive
    spread_sym = fixed.replace(
        estep=EStepConfig(method="fixed", fixed_bias_units="spread",
                          fixed_bg_bias=0.5, fixed_fg_bias=0.5)
    )
    assert not hints(spread_sym, n=1)
    # ASYMMETRIC spread biases get their own probe-backed hint (both
    # asymmetric warm arms eroded the prior)
    spread_asym = fixed.replace(
        estep=EStepConfig(method="fixed", fixed_bias_units="spread")
    )
    assert any("ASYMMETRIC" in h for h in hints(spread_asym, n=1))
    assert not hints(
        ExperimentConfig(mesh=MeshConfig(axes=(("data", 1),))), n=1
    )


def test_trainer_warns_on_fixed_logit_units(rng):
    """Trainer construction emits the config hints as UserWarnings."""
    from em_adapt_tpu.config import (
        EStepConfig,
        ExperimentConfig,
        MeshConfig,
        ModelConfig,
        OptimConfig,
        TrainConfig,
    )
    from em_adapt_tpu.train import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(32, 32), fc6_channels=8),
        estep=EStepConfig(method="fixed"),
        optim=OptimConfig(accum_steps=1),
        train=TrainConfig(batch_size=8),
        mesh=MeshConfig(axes=(("data", 8),)),
    )
    with pytest.warns(UserWarning, match="CONVERGENCE_FIXED"):
        Trainer(cfg, steps_per_epoch=4)
