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


def test_export_rejects_wrong_shape():
    from tests.test_model import SMALL_CFG, small_params_from_fixture

    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    cfg = ExperimentConfig(model=SMALL_CFG, eval=EvalConfig(batch_size=2))
    model = DeepLabLargeFOV(SMALL_CFG)
    fn = load_predict_fn(export_predict_fn(cfg, model, params))
    with pytest.raises(Exception):
        fn(jnp.zeros((2, 10, 10, 3), jnp.float32))
