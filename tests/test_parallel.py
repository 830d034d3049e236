"""Mesh construction and sharding plans, incl. dp+sp spatial partitioning."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from em_adapt_tpu.config import (  # noqa: E402
    EStepConfig,
    ExperimentConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from em_adapt_tpu.parallel.mesh import make_mesh  # noqa: E402


def test_make_mesh_auto_size():
    plan = make_mesh(MeshConfig(axes=(("data", -1), ("space", 1))))
    assert plan.num_data_shards == 8
    assert plan.num_space_shards == 1


def test_make_mesh_rejects_bad_split():
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(axes=(("data", 3), ("space", 2))))


def test_make_mesh_rejects_two_wildcard_axes():
    """Two -1 axes would each silently resolve to ALL remaining devices
    (review finding: the real error surfaced later as a misleading
    device-count mismatch, after the CLI had already auto-scaled the
    batch from the bogus data-axis size)."""
    with pytest.raises(ValueError, match="at most one"):
        make_mesh(MeshConfig(axes=(("data", -1), ("space", -1))))


def test_batch_sharding_specs():
    plan = make_mesh(MeshConfig(axes=(("data", 4), ("space", 2))))
    spec = plan.batch_sharding().spec
    assert tuple(spec) == ("data", "space")
    plan1 = make_mesh(MeshConfig(axes=(("data", 8), ("space", 1))))
    assert tuple(plan1.batch_sharding().spec) == ("data",)


def test_spatial_shard_batch_divisibility_error():
    plan = make_mesh(MeshConfig(axes=(("data", 4), ("space", 2))))
    with pytest.raises(ValueError, match="divisible"):
        plan.shard_batch({"image": np.zeros((8, 33, 33, 3), np.float32)})
    # Indivisible NON-image leaves (e.g. host-shrunk 41-row labels under
    # space=3) fall back to data-only sharding instead of erroring.
    out = plan.shard_batch({
        "image": np.zeros((8, 32, 32, 3), np.float32),
        "label": np.zeros((8, 41, 41, 1), np.uint8),
    })
    assert tuple(out["image"].sharding.spec) == ("data", "space")
    assert tuple(out["label"].sharding.spec) == ("data",)


def test_dp_sp_train_step_matches_dp_only(rng):
    """Spatial partitioning is a layout choice: the dp+sp step must compute
    the same loss as the dp-only step (same seeds, same data)."""
    from em_adapt_tpu.train import Trainer

    def run(axes):
        cfg = ExperimentConfig(
            model=ModelConfig(num_classes=4, input_size=(32, 32), fc6_channels=8),
            estep=EStepConfig(num_iter=2),
            optim=OptimConfig(accum_steps=1),
            train=TrainConfig(batch_size=8),
            mesh=MeshConfig(axes=axes),
        )
        trainer = Trainer(cfg, steps_per_epoch=4)
        state = trainer.init_state()
        g = np.random.default_rng(7)
        batch = {
            "image": g.normal(size=(8, 32, 32, 3)).astype(np.float32),
            "label": g.integers(0, 4, size=(8, 32, 32, 1)).astype(np.float32),
        }
        state, m = trainer.train_step(state, trainer.plan.shard_batch(batch))
        return float(jax.device_get(m["loss"]))

    loss_dp = run((("data", 8), ("space", 1)))
    loss_dpsp = run((("data", 4), ("space", 2)))
    assert loss_dp == pytest.approx(loss_dpsp, rel=1e-5)


def test_dp_sp_tp_train_step_matches_dp_only(rng):
    """Adding tensor parallelism of the fc head (model axis) must not
    change the computed loss."""
    from em_adapt_tpu.train import Trainer

    def run(axes):
        cfg = ExperimentConfig(
            model=ModelConfig(num_classes=4, input_size=(32, 32), fc6_channels=16),
            estep=EStepConfig(num_iter=2),
            optim=OptimConfig(accum_steps=1),
            train=TrainConfig(batch_size=8),
            mesh=MeshConfig(axes=axes),
        )
        trainer = Trainer(cfg, steps_per_epoch=4)
        state = trainer.init_state()
        g = np.random.default_rng(7)
        batch = {
            "image": g.normal(size=(8, 32, 32, 3)).astype(np.float32),
            "label": g.integers(0, 4, size=(8, 32, 32, 1)).astype(np.float32),
        }
        state, m = trainer.train_step(state, trainer.plan.shard_batch(batch))
        if trainer.state_shardings is not None:
            assert "model" in str(state.params["fc6"]["w"].sharding.spec)
        return float(jax.device_get(m["loss"]))

    loss_dp = run((("data", 8), ("space", 1)))
    loss_tp = run((("data", 2), ("space", 2), ("model", 2)))
    assert loss_dp == pytest.approx(loss_tp, abs=2e-5)


def test_place_state_restores_tp_sharding(rng):
    """Resume path regression (VERDICT round 1): a checkpoint restored to
    host arrays must come back TP-sharded via Trainer.place_state, not
    replicated."""
    from em_adapt_tpu.train import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(32, 32), fc6_channels=16),
        estep=EStepConfig(num_iter=2),
        optim=OptimConfig(accum_steps=1),
        train=TrainConfig(batch_size=8),
        mesh=MeshConfig(axes=(("data", 2), ("space", 2), ("model", 2))),
    )
    trainer = Trainer(cfg, steps_per_epoch=4)
    host_state = jax.device_get(trainer.init_state())  # checkpoint-shaped
    placed = trainer.place_state(host_state)
    assert "model" in str(placed.params["fc6"]["w"].sharding.spec)
    assert "model" in str(placed.params["fc7"]["w"].sharding.spec)
    # and a step runs on the placed state
    g = np.random.default_rng(7)
    batch = {
        "image": g.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "label": g.integers(0, 4, size=(8, 32, 32, 1)).astype(np.float32),
    }
    _, m = trainer.train_step(placed, trainer.plan.shard_batch(batch))
    assert np.isfinite(float(jax.device_get(m["loss"])))


def test_pallas_impls_on_mesh_match_xla_impls(rng):
    """Round-3 headline: the two Pallas kernels stay engaged on a
    multi-device mesh (shard_map over the data axis, ops/estep.py::
    _estep_pallas_dp + ops/block1_pallas.py::block1_fused_dp) and the
    full jitted train step computes the identical loss to the XLA
    implementations. Odd input size so block1_fused supports it."""
    from em_adapt_tpu.train import Trainer

    def run(block1_impl, estep_impl):
        cfg = ExperimentConfig(
            model=ModelConfig(num_classes=4, input_size=(33, 33),
                              fc6_channels=16, block1_impl=block1_impl),
            estep=EStepConfig(num_iter=2, impl=estep_impl),
            optim=OptimConfig(accum_steps=1),
            train=TrainConfig(batch_size=4),
            mesh=MeshConfig(axes=(("data", 4), ("space", 1), ("model", 2))),
        )
        trainer = Trainer(cfg, steps_per_epoch=4)
        state = trainer.init_state()
        g = np.random.default_rng(7)
        batch = {
            "image": g.normal(size=(4, 33, 33, 3)).astype(np.float32),
            "label": g.integers(0, 4, size=(4, 33, 33, 1)).astype(np.float32),
        }
        state, m = trainer.train_step(state, trainer.plan.shard_batch(batch))
        return float(jax.device_get(m["loss"]))

    loss_pallas = run("pallas", "pallas")
    loss_xla = run("xla", "jax")
    assert loss_pallas == pytest.approx(loss_xla, abs=2e-5)


def test_mesh_sharded_eval_matches_single_device():
    """Evaluator(plan=...) shards evaluation over the mesh's data axis:
    mIoU and per-class IoU must equal the single-device jit path for both
    the fixed-size protocol and the VOC original-resolution protocol, and
    the prediction must actually land on all 8 devices."""
    from em_adapt_tpu.config import DataConfig, EvalConfig
    from em_adapt_tpu.data.pipeline import SyntheticVOC, batch_iterator
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        data=DataConfig(input_size=(33, 33)),
        eval=EvalConfig(batch_size=8, use_crf=False),
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ds = SyntheticVOC(n=10, num_classes=4, seed=1, category="val")
    plan = make_mesh(MeshConfig(axes=(("data", 8),)))
    ev1 = Evaluator(cfg, model)
    ev8 = Evaluator(cfg, model, plan=plan)
    assert ev8.plan is not None

    def batches():
        return batch_iterator(
            ds, cfg.data, batch_size=8, seed=0, epochs=1, train=False,
            drop_remainder=False, pad_remainder=True,
        )

    miou1, iou1 = ev1.evaluate_fixed(params, batches())
    miou8, iou8 = ev8.evaluate_fixed(params, batches())
    assert miou8 == pytest.approx(miou1, abs=1e-12)
    np.testing.assert_allclose(iou8, iou1, atol=1e-12)

    # the sharded path really uses the whole mesh
    b = next(iter(batches()))
    pred = ev8.predict_batch(params, b["image"])
    assert len(pred.sharding.device_set) == 8

    vm1, vi1 = ev1.evaluate_voc(params, ds, use_crf=False)
    vm8, vi8 = ev8.evaluate_voc(params, ds, use_crf=False)
    assert vm8 == pytest.approx(vm1, abs=1e-12)
    np.testing.assert_allclose(vi8, vi1, atol=1e-12)


def test_mesh_sharded_eval_indivisible_batch_pads_up():
    """A batch size the data axis cannot divide (the default eval batch 6
    on an 8-chip mesh) is zero-padded to the next multiple and the pad
    rows sliced off — sharded results still match single-device exactly."""
    from em_adapt_tpu.config import DataConfig, EvalConfig
    from em_adapt_tpu.data.pipeline import SyntheticVOC
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        data=DataConfig(input_size=(33, 33)),
        eval=EvalConfig(batch_size=3, use_crf=False),
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ds = SyntheticVOC(n=7, num_classes=4, seed=2, category="val")
    plan = make_mesh(MeshConfig(axes=(("data", 8),)))
    ev1 = Evaluator(cfg, model)
    ev8 = Evaluator(cfg, model, plan=plan)
    g = np.random.default_rng(0)
    imgs = g.normal(size=(3, 33, 33, 3)).astype(np.float32)
    # Exact contract: sharded eval of 3 images == unsharded eval of the
    # SAME zero-padded batch-8 (what the pad-up does internally). Sharded
    # vs unsharded at equal shape is bit-identical (test above); across
    # DIFFERENT batch shapes XLA's fusion shifts ulps, so that is not the
    # promise.
    imgs8 = np.concatenate([imgs, np.zeros((5, 33, 33, 3), np.float32)])
    p1 = np.asarray(ev1.predict_batch(params, imgs8))[:3]
    p8 = np.asarray(ev8.predict_batch(params, imgs))
    assert p8.shape == (3, 33, 33)
    np.testing.assert_array_equal(p8, p1)
    # Tolerance contract for the full protocol (batch 3 unsharded pads to
    # 3, sharded pads to 8 — shape-dependent ulps can flip near-tie
    # argmax pixels of an UNTRAINED net; real margins dwarf this).
    vm1, vi1 = ev1.evaluate_voc(params, ds, use_crf=False)
    vm8, vi8 = ev8.evaluate_voc(params, ds, use_crf=False)
    assert vm8 == pytest.approx(vm1, abs=1e-3)
    np.testing.assert_allclose(vi8, vi1, atol=1e-3)


def test_mesh_sharded_device_crf_eval_matches_single_device():
    """The on-device batched CRF eval (crf_impl='tpu') sharded over the
    data axis reproduces the single-device confusion exactly (per-image
    computation; batch sharding is a layout choice)."""
    from em_adapt_tpu.config import EvalConfig
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    class _TinyValDS:
        ids = [f"t{i}" for i in range(5)]

        def __len__(self):
            return 5

        def load_raw(self, i):
            g = np.random.default_rng(50 + i)
            h, w = [(20, 24), (24, 20), (18, 18), (24, 24), (19, 23)][i]
            img = g.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            lab = g.integers(0, 4, size=(h, w)).astype(np.uint8)
            return img, lab

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        eval=EvalConfig(
            batch_size=8, crf_impl="tpu", crf_bucket=(24, 24),
            crf_buckets=(), crf_iterations=2, use_crf=True,
        ),
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ds = _TinyValDS()
    plan = make_mesh(MeshConfig(axes=(("data", 8),)))
    m1, i1 = Evaluator(cfg, model).evaluate_voc(params, ds, use_crf=True)
    m8, i8 = Evaluator(cfg, model, plan=plan).evaluate_voc(
        params, ds, use_crf=True
    )
    assert m8 == pytest.approx(m1, abs=1e-12)
    np.testing.assert_allclose(i8, i1, atol=1e-12)


def test_mesh_sharded_eval_keeps_tp_sharded_params(rng):
    """Params coming straight from dp x tp training (fc6/fc7 sharded over
    the model axis) must pass through Evaluator._ensure_params untouched
    (no replication that would undo the TP layout) and evaluate correctly
    on the same mesh."""
    from em_adapt_tpu.config import DataConfig, EvalConfig
    from em_adapt_tpu.data.pipeline import SyntheticVOC, batch_iterator
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.train import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(32, 32), fc6_channels=16),
        estep=EStepConfig(num_iter=2),
        optim=OptimConfig(accum_steps=1),
        data=DataConfig(input_size=(32, 32)),
        train=TrainConfig(batch_size=8),
        eval=EvalConfig(batch_size=8, use_crf=False),
        mesh=MeshConfig(axes=(("data", 4), ("space", 1), ("model", 2))),
    )
    trainer = Trainer(cfg, steps_per_epoch=4)
    state = trainer.init_state()
    assert "model" in str(state.params["fc6"]["w"].sharding.spec)
    ev = Evaluator(cfg, trainer.model, plan=trainer.plan)
    ensured = ev._ensure_params(state.params)
    assert ensured is state.params  # pass-through, not a replicated copy
    ds = SyntheticVOC(n=8, num_classes=4, seed=3, category="val")
    batches = batch_iterator(ds, cfg.data, batch_size=8, seed=0, epochs=1,
                             train=False, drop_remainder=False,
                             pad_remainder=True)
    miou, _ = ev.evaluate_fixed(state.params, batches)
    assert 0.0 <= miou <= 1.0


def test_remat_under_spatial_mesh_matches_no_remat(rng):
    """The tpu-highres preset combines model.remat with space=3
    (SPATIAL.json recipe; round-5 productization). remat must stay a
    pure memory/time trade UNDER the spatially-partitioned mesh: one
    train step with remat on a dp2 x space3 mesh computes the same loss
    as the non-remat step on the identical mesh, and as the remat step
    on a dp-only mesh. 33-row input splits 3-way cleanly."""
    from em_adapt_tpu.train import Trainer

    def run(axes, remat):
        cfg = ExperimentConfig(
            model=ModelConfig(num_classes=4, input_size=(33, 33),
                              fc6_channels=8, remat=remat),
            estep=EStepConfig(num_iter=2),
            optim=OptimConfig(accum_steps=1),
            train=TrainConfig(batch_size=8),
            mesh=MeshConfig(axes=axes),
        )
        n = 1
        for _, size in axes:
            n *= size
        trainer = Trainer(cfg, steps_per_epoch=4,
                          devices=jax.devices()[:n])
        state = trainer.init_state()
        g = np.random.default_rng(7)
        batch = {
            "image": g.normal(size=(8, 33, 33, 3)).astype(np.float32),
            "label": g.integers(0, 4, size=(8, 33, 33, 1)).astype(np.float32),
        }
        state, m = trainer.train_step(state, trainer.plan.shard_batch(batch))
        return float(jax.device_get(m["loss"]))

    sp_axes = (("data", 2), ("space", 3))
    loss_sp_remat = run(sp_axes, True)
    loss_sp = run(sp_axes, False)
    loss_dp_remat = run((("data", 8), ("space", 1)), True)
    assert loss_sp_remat == pytest.approx(loss_sp, rel=1e-5)
    assert loss_sp_remat == pytest.approx(loss_dp_remat, rel=1e-5)
