"""int8 PTQ serving path: quantizer mechanics, end-to-end agreement with
the f32 model, and composition with Evaluator / export."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from em_adapt_tpu.eval.quantize import (  # noqa: E402
    QuantizedDeepLabLargeFOV,
    observe_activation_ranges,
    quantization_agreement,
    quantize_model,
    quantize_params,
)
from em_adapt_tpu.models import DeepLabLargeFOV  # noqa: E402
from tests.test_model import SMALL_CFG, small_params_from_fixture  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="module")
def fixture_model():
    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    return params, jnp.asarray(z["x"])


@pytest.fixture(scope="module")
def act_ranges(fixture_model):
    """Calibration ranges for the fixture model, computed once: the
    observe pass re-traces the full forward, which is real time on the
    1-core suite host."""
    params, x = fixture_model
    return observe_activation_ranges(SMALL_CFG, params, [x])


@pytest.fixture(scope="module")
def quantized(fixture_model):
    """(qmodel, qparams) for the fixture model, quantized once and shared
    read-only by every agreement/compose/export test below."""
    params, x = fixture_model
    return quantize_model(SMALL_CFG, params, [x])


def test_weight_quantization_roundtrip_bound(fixture_model, act_ranges):
    """Per-channel symmetric int8: |w - w8*s| <= s/2 elementwise, and the
    full [-127, 127] range is actually used per channel."""
    params, x = fixture_model
    q = quantize_params(params, act_ranges, SMALL_CFG)
    for name in ("conv1_1", "fc6", "fc8"):
        w = np.asarray(params[name]["w"], np.float32)
        w8 = np.asarray(q[name]["w8"])
        s_w = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
        assert w8.dtype == np.int8
        assert np.all(
            np.abs(w - w8.astype(np.float32) * s_w) <= s_w * 0.5 + 1e-12
        )
        # the channel max quantizes to exactly +-127
        assert np.abs(w8).max() == 127


def test_calibration_ranges_positive_and_complete(fixture_model, act_ranges):
    params, x = fixture_model
    from em_adapt_tpu.models.deeplab import layer_specs

    assert set(act_ranges) == {n for n, *_ in layer_specs(SMALL_CFG)}
    assert all(v > 0 for v in act_ranges.values())
    # conv1_1's range is the preprocessed image range
    assert act_ranges["conv1_1"] == pytest.approx(float(jnp.max(jnp.abs(x))))


def test_quantized_logits_close_and_labels_agree(fixture_model, quantized):
    """End-to-end PTQ quality on the fixture model: <8% relative logit
    error, >95% pixel label agreement (measured 4.0% / 98.1% — and this
    is an UNTRAINED random-weight model; trained models have larger
    argmax margins)."""
    params, x = fixture_model
    qmodel, qparams = quantized
    model = DeepLabLargeFOV(SMALL_CFG)
    lg = model.apply(params, x, train=False)
    qlg = qmodel.apply(qparams, x)
    rel = float(jnp.linalg.norm(qlg - lg) / jnp.linalg.norm(lg))
    assert rel < 0.08, rel
    agree = quantization_agreement(SMALL_CFG, params, qparams, [x])
    assert agree["pixel_agreement"] > 0.95, agree


def test_quantized_model_rejects_train(fixture_model, quantized):
    params, x = fixture_model
    qmodel, qparams = quantized
    with pytest.raises(ValueError, match="serving-only"):
        qmodel.apply(qparams, x, train=True)


def test_quantized_model_composes_with_evaluator(fixture_model, quantized):
    """QuantizedDeepLabLargeFOV duck-types the model for Evaluator."""
    from em_adapt_tpu.config import ExperimentConfig
    from em_adapt_tpu.eval.predict import Evaluator

    params, x = fixture_model
    qmodel, qparams = quantized
    cfg = ExperimentConfig(model=SMALL_CFG)
    ev = Evaluator(cfg, qmodel)
    label = np.zeros(x.shape[:3] + (1,), np.float32)
    miou, iou = ev.evaluate_fixed(qparams, [{"image": np.asarray(x), "label": label}])
    assert 0.0 <= miou <= 1.0
    assert iou.shape == (SMALL_CFG.num_classes,)


def test_quantized_model_composes_with_mesh_sharded_evaluator(fixture_model, quantized):
    """int8 qparams (freshly calibrated -> committed to the default
    device) + Evaluator(plan=...): _ensure_params must replicate them
    onto the mesh and the sharded eval must match unsharded exactly at
    the same batch shape."""
    import jax

    from em_adapt_tpu.config import EvalConfig, ExperimentConfig, MeshConfig
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.parallel.mesh import make_mesh

    params, x = fixture_model
    qmodel, qparams = quantized
    cfg = ExperimentConfig(model=SMALL_CFG, eval=EvalConfig(batch_size=2))
    plan = make_mesh(MeshConfig(axes=(("data", 8),)))
    x8 = np.concatenate([np.asarray(x)] * 4)  # batch 8 over 8 shards
    label = np.zeros(x8.shape[:3] + (1,), np.float32)
    batch = [{"image": x8, "label": label}]
    m1, i1 = Evaluator(cfg, qmodel).evaluate_fixed(qparams, batch)
    m8, i8 = Evaluator(cfg, qmodel, plan=plan).evaluate_fixed(qparams, batch)
    assert m8 == pytest.approx(m1, abs=1e-12)
    np.testing.assert_allclose(i8, i1, atol=1e-12)


def test_quantized_export_roundtrip(fixture_model, quantized):
    """An int8 StableHLO serving artifact: export_predict_fn over the
    quantized model serializes and reproduces the live quantized
    predictions exactly."""
    from em_adapt_tpu.config import EvalConfig, ExperimentConfig
    from em_adapt_tpu.eval.export import export_predict_fn, load_predict_fn

    params, x = fixture_model
    qmodel, qparams = quantized
    cfg = ExperimentConfig(model=SMALL_CFG, eval=EvalConfig(batch_size=2))
    fn = load_predict_fn(export_predict_fn(cfg, qmodel, qparams))
    _, pred = fn(x)
    _, live_pred = qmodel.predict(qparams, x)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(live_pred))


def test_quantized_predict_shards_over_data_mesh(fixture_model, quantized):
    """The int8 serving path is plain XLA (s8 convs, no pallas), so GSPMD
    shards it over a data-parallel mesh with no special casing: batch
    sharded over 8 fake devices == single-device result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    params, x = fixture_model
    qmodel, qparams = quantized
    x8 = jnp.concatenate([x] * 4)  # batch 8 over 8 devices
    ref = jax.device_get(qmodel.predict(qparams, x8)[1])

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    xs = jax.device_put(x8, NamedSharding(mesh, P("data")))
    qs = jax.device_put(qparams, NamedSharding(mesh, P()))
    pred = jax.jit(lambda p, v: qmodel.predict(p, v)[1])(qs, xs)
    np.testing.assert_array_equal(jax.device_get(pred), ref)


def test_uint8_wire_input_matches_float(fixture_model):
    """The compact uint8 wire contract holds for the quantized model."""
    params, _ = fixture_model
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, size=(2, 65, 65, 3), dtype=np.uint8)
    from em_adapt_tpu.data.augment import BGR_MEAN

    pre = raw[..., ::-1].astype(np.float32) - np.asarray(BGR_MEAN, np.float32)
    qmodel, qparams = quantize_model(SMALL_CFG, params, [jnp.asarray(pre)])
    a = qmodel.apply(qparams, jnp.asarray(raw))
    b = qmodel.apply(qparams, jnp.asarray(pre))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)
