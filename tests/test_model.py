"""DeepLab-LargeFOV model parity and behavior tests."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from em_adapt_tpu.config import ModelConfig  # noqa: E402
from em_adapt_tpu.models import DeepLabLargeFOV, init_params, load_caffe_init  # noqa: E402

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

SMALL_CFG = ModelConfig(num_classes=5, input_size=(65, 65), fc6_channels=48)
# Channel widths of the reduced fixture (generate_model_goldens.py).
SMALL_SPECS = {
    "conv1_1": (3, 3, 3, 8), "conv1_2": (3, 3, 8, 8),
    "conv2_1": (3, 3, 8, 16), "conv2_2": (3, 3, 16, 16),
    "conv3_1": (3, 3, 16, 32), "conv3_2": (3, 3, 32, 32), "conv3_3": (3, 3, 32, 32),
    "conv4_1": (3, 3, 32, 64), "conv4_2": (3, 3, 64, 64), "conv4_3": (3, 3, 64, 64),
    "conv5_1": (3, 3, 64, 64), "conv5_2": (3, 3, 64, 64), "conv5_3": (3, 3, 64, 64),
    "fc6": (4, 4, 64, 48), "fc7": (1, 1, 48, 48), "fc8": (1, 1, 48, 5),
}


def small_params_from_fixture(z):
    return {
        name: {"w": jnp.asarray(z[f"{name}_w"]), "b": jnp.asarray(z[f"{name}_b"])}
        for name in SMALL_SPECS
    }


def apply_reduced(params, x):
    """Run the real model apply() on the reduced-width fixture weights.

    The layer graph (order, rates, pools) is the production one; only the
    channel widths differ, which apply() never inspects.
    """
    model = DeepLabLargeFOV(SMALL_CFG)
    return model.apply(params, x, train=False)


def test_logits_match_tf_reference_ops():
    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    got = np.asarray(apply_reduced(params, jnp.asarray(z["x"])))
    want = z["logits"]
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * max(scale, 1.0), rtol=1e-4)


def test_output_stride_8_full_size():
    """321x321 -> 41x41 (ceil-mode pooling; SURVEY.md §2)."""
    cfg = ModelConfig(num_classes=4, fc6_channels=8)
    # Tiny-width params for speed: reuse init with scaled spec via fc6_channels
    # and synthetic conv widths is not possible without real widths, so just
    # run the conv spec shapes on a narrow input batch.
    key = jax.random.key(0)
    params = init_params(key, cfg)
    model = DeepLabLargeFOV(cfg)
    x = jnp.zeros((1, 321, 321, 3), jnp.float32)
    out = jax.eval_shape(lambda p, x: model.apply(p, x), params, x)
    assert out.shape == (1, 41, 41, 4)


def test_dropout_train_vs_eval():
    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    model = DeepLabLargeFOV(SMALL_CFG)
    x = jnp.asarray(z["x"])
    e1 = model.apply(params, x, train=False)
    e2 = model.apply(params, x, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    t1 = model.apply(params, x, train=True, rng=jax.random.key(1))
    t2 = model.apply(params, x, train=True, rng=jax.random.key(2))
    assert np.abs(np.asarray(t1) - np.asarray(t2)).max() > 1e-3
    with pytest.raises(ValueError):
        model.apply(params, x, train=True)


def test_caffe_init_loading():
    cfg = SMALL_CFG
    init_model = load_caffe_init(os.path.join(FIX, "init_small.npy"))
    # init_params validates shapes against layer_specs; the reduced fixture
    # widths differ from production VGG, so check the loader + fc8 policy
    # directly on a custom spec by monkeypatching layer widths is overkill —
    # instead verify dict structure and the fc8 xavier override.
    assert set(init_model) >= {"conv1_1", "fc6", "fc8"}
    assert init_model["conv3_2"]["w"].shape == (3, 3, 32, 32)

    # fc8 must NOT copy pretrained values (xavier re-init, deeplab.py:156-167).
    import em_adapt_tpu.models.deeplab as dl

    specs = tuple((n,) + SMALL_SPECS[n][:2] + SMALL_SPECS[n][2:] + ((2 if n.startswith("conv5") else 4 if n == "fc6" else 1),) for n in SMALL_SPECS)
    orig = dl.layer_specs
    dl.layer_specs = lambda cfg: specs
    try:
        params = init_params(jax.random.key(0), cfg, init_model)
    finally:
        dl.layer_specs = orig
    np.testing.assert_array_equal(
        np.asarray(params["conv1_1"]["w"]), init_model["conv1_1"]["w"]
    )
    assert np.abs(np.asarray(params["fc8"]["w"]) - init_model["fc8"]["w"]).max() > 1e-3
    # xavier limit for 1x1x48x5: sqrt(6/53)
    lim = np.sqrt(6.0 / (48 + 5))
    assert np.abs(np.asarray(params["fc8"]["w"])).max() <= lim


def test_random_init_stats():
    cfg = ModelConfig(num_classes=4, fc6_channels=16)
    params = init_params(jax.random.key(0), cfg)
    w = np.asarray(params["conv1_1"]["w"])
    assert abs(w.std() - 0.01) < 0.005
    assert np.asarray(params["conv1_1"]["b"]).sum() == 0.0


def test_config_knobs_wire_into_architecture():
    """conv5_rate and input_channels must actually change the network
    (round-1 VERDICT: they were silently ignored)."""
    from em_adapt_tpu.models.deeplab import vgg_conv_specs

    cfg = ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8,
                      input_channels=5, conv5_rate=3)
    specs = {name: (cin, rate) for name, _, _, cin, _, rate in vgg_conv_specs(cfg)}
    assert specs["conv1_1"][0] == 5
    assert specs["conv5_1"][1] == 3 and specs["conv5_3"][1] == 3

    model = DeepLabLargeFOV(cfg)
    params = model.init(jax.random.key(0))
    assert params["conv1_1"]["w"].shape == (3, 3, 5, 64)
    out = model.apply(params, jnp.zeros((1, 33, 33, 5)))
    assert out.shape == (1, 5, 5, 4)
    # a different conv5 rate changes the logits vs the default rate
    base = DeepLabLargeFOV(ModelConfig(num_classes=4, input_size=(33, 33),
                                       fc6_channels=8, input_channels=5))
    out2 = base.apply(params, jnp.ones((1, 33, 33, 5)))
    out3 = model.apply(params, jnp.ones((1, 33, 33, 5)))
    assert not np.allclose(np.asarray(out2), np.asarray(out3), atol=0, rtol=1e-3)


def test_uint8_input_normalized_on_device():
    """uint8 RGB inputs (the compact wire format) must produce the same
    logits as host-preprocessed float inputs, up to the <=0.5-intensity
    wire rounding."""
    from em_adapt_tpu.data.augment import augment_train

    g = np.random.default_rng(0)
    raw_img = g.integers(0, 256, size=(100, 140, 3), dtype=np.uint8)
    raw_lab = g.integers(0, 4, size=(100, 140), dtype=np.uint8)
    f_img, f_lab = augment_train(raw_img, raw_lab, np.random.default_rng(3),
                                 input_size=(33, 33))
    u_img, u_lab = augment_train(raw_img, raw_lab, np.random.default_rng(3),
                                 input_size=(33, 33), wire_dtype="uint8")
    assert u_img.dtype == np.uint8 and u_lab.dtype == np.uint8
    np.testing.assert_array_equal(f_lab.astype(np.uint8), u_lab)  # exact

    cfg = ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8,
                      init_scheme="he")
    model = DeepLabLargeFOV(cfg)
    params = model.init(jax.random.key(0))
    lf = np.asarray(model.apply(params, jnp.asarray(f_img)[None]))
    lu = np.asarray(model.apply(params, jnp.asarray(u_img)[None]))
    # He-init logits are O(1-10); 0.5-intensity input rounding stays small.
    assert np.abs(lf - lu).max() < 0.05 * np.abs(lf).max()


def test_width_multiplier_variant():
    cfg = ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=16,
                      width_multiplier=0.25)
    model = DeepLabLargeFOV(cfg)
    params = model.init(jax.random.key(0))
    assert params["conv1_1"]["w"].shape == (3, 3, 3, 16)  # 64 * 0.25
    assert params["conv5_3"]["w"].shape == (3, 3, 128, 128)  # 512 * 0.25
    assert params["fc6"]["w"].shape == (4, 4, 128, 16)
    out = model.apply(params, jnp.zeros((1, 33, 33, 3)))
    assert out.shape == (1, 5, 5, 4)


def test_weight_l2_excludes_bias():
    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    model = DeepLabLargeFOV(SMALL_CFG)
    l2 = float(model.weight_l2(params))
    expect = sum(0.5 * float((z[f"{n}_w"] ** 2).sum()) for n in SMALL_SPECS)
    np.testing.assert_allclose(l2, expect, rtol=1e-5)


def test_predict_upsamples_to_input():
    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    model = DeepLabLargeFOV(SMALL_CFG)
    up, pred = model.predict(params, jnp.asarray(z["x"]))
    assert up.shape == (2, 65, 65, 5)
    assert pred.shape == (2, 65, 65)
    assert pred.dtype == jnp.int32


def test_remat_identical_forward_and_grads():
    """remat=True must be a pure memory/time trade: bit-identical outputs."""
    import jax.numpy as jnp

    z = np.load(os.path.join(FIX, "model_small.npz"))
    params = small_params_from_fixture(z)
    x = jnp.asarray(z["x"])
    base = DeepLabLargeFOV(SMALL_CFG)
    rem = DeepLabLargeFOV(
        ModelConfig(num_classes=5, input_size=(65, 65), fc6_channels=48, remat=True)
    )
    np.testing.assert_array_equal(
        np.asarray(base.apply(params, x)), np.asarray(rem.apply(params, x))
    )
    g1 = jax.grad(lambda p: float(0) + jnp.sum(base.apply(p, x)))(params)
    g2 = jax.grad(lambda p: float(0) + jnp.sum(rem.apply(p, x)))(params)
    for n in g1:
        np.testing.assert_array_equal(np.asarray(g1[n]["w"]), np.asarray(g2[n]["w"]))
