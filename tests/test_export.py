"""Serialized inference artifacts: export -> deserialize -> call parity."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from em_adapt_tpu.config import ExperimentConfig, EvalConfig, ModelConfig  # noqa: E402
from em_adapt_tpu.eval.export import export_predict_fn, load_predict_fn  # noqa: E402
from em_adapt_tpu.models import DeepLabLargeFOV  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_export_roundtrip_matches_live_predict():
    from tests.test_model import SMALL_CFG, small_params_from_fixture

    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    cfg = ExperimentConfig(model=SMALL_CFG, eval=EvalConfig(batch_size=2))
    model = DeepLabLargeFOV(SMALL_CFG)

    blob = export_predict_fn(cfg, model, params)
    assert isinstance(blob, bytes) and len(blob) > 1000

    fn = load_predict_fn(blob)
    x = jnp.asarray(z["x"])
    probs, pred = fn(x)
    live_up, live_pred = model.predict(params, x)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(live_pred))
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(jax.nn.softmax(live_up, -1)), atol=1e-4
    )


def test_export_params_npy_roundtrips_through_caffe_loader(tmp_path):
    """init.npy interchange: exported weights re-enter through the SAME
    loader the reference's init.npy path uses (load_caffe_init ->
    init_params(init_model=...)) and reproduce every non-fc8 layer
    bit-for-bit (fc8 is re-initialized by contract, reference
    deeplab.py:156-167)."""
    from em_adapt_tpu.eval.export import export_params_npy
    from em_adapt_tpu.models.deeplab import init_params, load_caffe_init
    from tests.test_model import SMALL_CFG, small_params_from_fixture

    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    path = str(tmp_path / "trained_init.npy")
    export_params_npy(params, path)

    loaded = load_caffe_init(path)
    assert set(loaded) == set(params)
    for layer, leaves in params.items():
        assert loaded[layer]["w"].dtype == np.float32
        np.testing.assert_array_equal(
            loaded[layer]["w"], np.asarray(leaves["w"], np.float32)
        )
        np.testing.assert_array_equal(
            loaded[layer]["b"], np.asarray(leaves["b"], np.float32)
        )
    # SMALL_CFG's layer_specs need the fixture's reduced widths
    # (conv1=8 ... conv5=64, i.e. width_multiplier 1/8) for the regraft.
    reduced_cfg = ModelConfig(
        num_classes=5, input_size=(65, 65), fc6_channels=48,
        width_multiplier=0.125,
    )
    regrafted = init_params(jax.random.key(0), reduced_cfg, init_model=loaded)
    for layer in params:
        if layer == "fc8":
            continue
        np.testing.assert_array_equal(
            np.asarray(regrafted[layer]["w"]), np.asarray(params[layer]["w"])
        )


def test_export_rejects_wrong_shape():
    from tests.test_model import SMALL_CFG, small_params_from_fixture

    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    cfg = ExperimentConfig(model=SMALL_CFG, eval=EvalConfig(batch_size=2))
    model = DeepLabLargeFOV(SMALL_CFG)
    fn = load_predict_fn(export_predict_fn(cfg, model, params))
    with pytest.raises(Exception):
        fn(jnp.zeros((2, 10, 10, 3), jnp.float32))
