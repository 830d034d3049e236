"""Fused Pallas block1 kernel (ops/block1_pallas.py) vs the XLA conv path.

The XLA path (conv2d_same + max_pool_same) is itself golden-tested
against tf.compat.v1 kernels (tests/test_tf_ops.py), so f32 parity with
it pins the fused kernel to the reference semantics
(reference deeplab.py:51-84). Tests run the identical kernel program in
interpret mode (conftest forces the CPU backend).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from em_adapt_tpu.config import ModelConfig
from em_adapt_tpu.models.deeplab import DeepLabLargeFOV
from em_adapt_tpu.ops.block1_pallas import block1_fused, block1_supported
from em_adapt_tpu.ops.conv import conv2d_same
from em_adapt_tpu.ops.pooling import max_pool_same


def _xla_block1(x, w1, b1, w2, b2):
    h = jax.nn.relu(conv2d_same(x, w1, b1))
    h = jax.nn.relu(conv2d_same(h, w2, b2))
    return max_pool_same(h, 3, 2)


def _params(rng, c1, f):
    return (
        jnp.asarray(rng.normal(size=(3, 3, c1, f)) * 0.2, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(3, 3, f, f)) * 0.1, jnp.float32),
        jnp.asarray(rng.normal(size=(f,)) * 0.1, jnp.float32),
    )


@pytest.mark.parametrize("h", [13, 41, 53])
def test_forward_matches_xla(h):
    """f32 forward parity across strip counts (13/41 -> one strip,
    53 -> OH=27 -> three strips of PT=9)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, h, 3)), jnp.float32)
    w1, b1, w2, b2 = _params(rng, 3, 16)
    want = _xla_block1(x, w1, b1, w2, b2)
    got = block1_fused(x, w1, b1, w2, b2, True)
    assert got.shape == want.shape == (2, (h + 1) // 2, (h + 1) // 2, 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gradients_match_xla():
    """All four parameter cotangents match XLA autodiff at f32 (the
    strip-ownership masks must count every y2 row's gradient exactly
    once across overlapping strips — H=53 runs three strips)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 53, 53, 3)), jnp.float32)
    params = _params(rng, 3, 16)

    def loss_ref(p):
        return jnp.sum(_xla_block1(x, *p) ** 2)

    def loss_fused(p):
        return jnp.sum(block1_fused(x, *p, True) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_fused = jax.grad(loss_fused)(params)
    for name, a, b in zip(("w1", "b1", "w2", "b2"), g_ref, g_fused):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-4,
            err_msg=f"d{name} mismatch")


def test_grad_x_is_zero():
    """dx is intentionally zero (block1 is the first layer; the train
    step never differentiates w.r.t. the image)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 13, 13, 3)), jnp.float32)
    p = _params(rng, 3, 8)
    dx = jax.grad(lambda t: jnp.sum(block1_fused(t, *p, True) ** 2))(x)
    assert float(jnp.max(jnp.abs(dx))) == 0.0


def test_bfloat16_path():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 41, 41, 3)), jnp.bfloat16)
    w1, b1, w2, b2 = _params(rng, 3, 16)
    got = block1_fused(x, w1, b1, w2, b2, True)
    assert got.dtype == jnp.bfloat16
    want = _xla_block1(x.astype(jnp.float32), w1, b1, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), rtol=0.05, atol=0.05)


def test_pool_tie_gradient_first_match():
    """Pool ties route to the FIRST (row-major) max position — exactly
    XLA SelectAndScatter's tie-break — so gradients match the conv path
    even where exact ties are the norm (flat regions; round 2 routed to
    EVERY tied position, inflating those gradients up to 9x)."""
    rng = np.random.default_rng(4)
    f = 8
    # identity-ish setup: w2 = center-tap identity, w1 maps channel 0
    # to all outputs, zero biases -> y2 == broadcast of a known map
    w1 = jnp.zeros((3, 3, 3, f), jnp.float32).at[1, 1, 0, :].set(1.0)
    w2 = jnp.zeros((3, 3, f, f), jnp.float32)
    w2 = w2.at[1, 1, :, :].set(jnp.eye(f))
    b1 = jnp.zeros((f,), jnp.float32)
    b2 = jnp.zeros((f,), jnp.float32)
    xmap = np.zeros((1, 13, 13, 3), np.float32)
    xmap[0, 4, 4, 0] = 2.0  # two equal maxima in pooled window (2, 2)
    xmap[0, 5, 5, 0] = 2.0
    x = jnp.asarray(xmap)

    def loss(p):
        return jnp.sum(block1_fused(x, *p, True))

    dw1 = jax.grad(loss)((w1, b1, w2, b2))[0]
    # (4,4) is row-major-first in the tied window -> it takes that
    # window's full gradient; (5,5) keeps its 3 solo windows.
    # dz1[(4,4)]=1, dz1[(5,5)]=3 -> dw1 center tap = 2*1 + 2*3 = 8.0,
    # identical to the XLA SelectAndScatter routing.
    assert float(dw1[1, 1, 0, 0]) == pytest.approx(8.0)

    # Randomized integer-valued inputs (exact ties everywhere, including
    # a fully flat border region): ALL parameter gradients must equal
    # the XLA path's bit-for-bit routing to f32 tolerance.
    xi = rng.integers(0, 3, size=(2, 13, 13, 3)).astype(np.float32)
    xi[:, :4, :4] = 1.0  # flat patch -> many 9-way ties
    xi = jnp.asarray(xi)
    w1r = jnp.asarray(rng.integers(-2, 3, size=(3, 3, 3, f)), jnp.float32)
    w2r = jnp.asarray(rng.integers(-2, 3, size=(3, 3, f, f)), jnp.float32)
    p = (w1r, b1, w2r, b2)

    def loss_x(p):
        return jnp.sum(_xla_block1(xi, *p) * 0.01)

    def loss_f(p):
        return jnp.sum(block1_fused(xi, *p, True) * 0.01)

    g_x = jax.grad(loss_x)(p)
    g_f = jax.grad(loss_f)(p)
    for name, a, b in zip(("w1", "b1", "w2", "b2"), g_x, g_f):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=1e-5, atol=1e-5, err_msg=f"d{name} tie-routing mismatch")


def test_unsupported_shape_raises():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 40, 40, 3)), jnp.float32)  # even
    p = _params(rng, 3, 8)
    with pytest.raises(ValueError, match="square odd"):
        block1_fused(x, *p, True)
    assert not block1_supported(40, 40)
    assert not block1_supported(41, 43)
    assert block1_supported(321, 321)


def test_model_logits_match_xla_impl():
    """DeepLabLargeFOV with block1_impl='pallas' reproduces the 'xla'
    logits (f32, small width) — the full-model integration check."""
    rng = jax.random.key(0)
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(1, 41, 41, 3)) * 20,
        jnp.float32)
    cfg_x = ModelConfig(width_multiplier=0.125, fc6_channels=64,
                        num_classes=5, input_size=(41, 41),
                        block1_impl="xla")
    cfg_p = ModelConfig(width_multiplier=0.125, fc6_channels=64,
                        num_classes=5, input_size=(41, 41),
                        block1_impl="pallas")
    params = DeepLabLargeFOV(cfg_x).init(rng)
    logits_x = DeepLabLargeFOV(cfg_x).apply(params, x)
    logits_p = DeepLabLargeFOV(cfg_p).apply(params, x)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_x),
                               rtol=1e-4, atol=1e-4)


def test_model_train_grads_match_xla_impl():
    """Full-model parameter gradients agree between implementations."""
    key = jax.random.key(0)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 41, 41, 3)) * 20,
        jnp.float32)
    kw = dict(width_multiplier=0.125, fc6_channels=64, num_classes=5,
              input_size=(41, 41))
    cfg_x = ModelConfig(block1_impl="xla", **kw)
    cfg_p = ModelConfig(block1_impl="pallas", **kw)
    params = DeepLabLargeFOV(cfg_x).init(key)

    def loss(model, p):
        logits = model.apply(p, x, train=True, rng=jax.random.key(1))
        return jnp.mean(logits ** 2)

    g_x = jax.grad(lambda p: loss(DeepLabLargeFOV(cfg_x), p))(params)
    g_p = jax.grad(lambda p: loss(DeepLabLargeFOV(cfg_p), p))(params)

    def check(a, b):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-8)
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale,
            rtol=2e-4, atol=2e-4)

    jax.tree.map(check, g_x, g_p)


def test_auto_gating_resolution(monkeypatch):
    """'auto' engages the fused kernel only for: training, small PER-CHIP
    batch, TPU backend (with enough VMEM), supported shape — and on
    multiple devices only with a mesh to shard_map over. Each condition
    flips the decision independently (the TPU/backend conditions are
    monkeypatched — tests run on CPU)."""
    from jax.sharding import Mesh

    model = DeepLabLargeFOV(
        ModelConfig(block1_impl="auto", compute_dtype="bfloat16")
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    assert model._block1_mode(6, 321, 321, True) == "pallas"
    assert model._block1_mode(6, 321, 321, False) == "xla"   # inference
    # f32 compute: the kernel's f32 working set exceeds scoped VMEM
    # (measured OOM on v5e, round 3) — auto keeps XLA
    f32_model = DeepLabLargeFOV(ModelConfig(block1_impl="auto"))
    assert f32_model._block1_mode(6, 321, 321, True) == "xla"
    # FORCED 'pallas' on a TPU backend with the same known-fatal
    # combinations must fail as a config error, not an opaque Mosaic
    # scoped-VMEM OOM inside jit (review finding)
    forced_f32 = DeepLabLargeFOV(ModelConfig(block1_impl="pallas"))
    with pytest.raises(ValueError, match="bfloat16"):
        forced_f32._block1_mode(6, 321, 321, True)
    import em_adapt_tpu.ops.block1_pallas as _b1

    forced_bf16 = DeepLabLargeFOV(
        ModelConfig(block1_impl="pallas", compute_dtype="bfloat16")
    )
    monkeypatch.setattr(_b1, "block1_vmem_ok", lambda: False)
    with pytest.raises(ValueError, match="VMEM"):
        forced_bf16._block1_mode(6, 321, 321, True)
    monkeypatch.setattr(_b1, "block1_vmem_ok", lambda: True)
    assert forced_bf16._block1_mode(6, 321, 321, True) == "pallas"
    assert model._block1_mode(24, 321, 321, True) == "xla"   # big batch
    assert model._block1_mode(6, 320, 320, True) == "xla"    # even size
    monkeypatch.setattr(jax, "device_count", lambda: 8)
    # multi-chip without a mesh: GSPMD can't partition the kernel
    assert model._block1_mode(6, 321, 321, True) == "xla"
    # multi-chip WITH a mesh: shard_map keeps the kernel engaged
    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    assert model._block1_mode(8, 321, 321, True, mesh) == "pallas_dp"
    # per-CHIP batch gates the crossover: global 48 over dp4 = 12 > 8
    assert model._block1_mode(48, 321, 321, True, mesh) == "xla"
    # batch must divide the mesh's data axis (6 % 4 != 0)
    assert model._block1_mode(6, 321, 321, True, mesh) == "xla"
    monkeypatch.setattr(jax, "device_count", lambda: 1)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert model._block1_mode(6, 321, 321, True) == "xla"    # off-TPU
    # v2/v3 VMEM (16 MiB) cannot fit the kernel: auto falls back
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    import em_adapt_tpu.ops.block1_pallas as b1

    monkeypatch.setattr(b1, "block1_vmem_ok", lambda: False)
    assert model._block1_mode(6, 321, 321, True) == "xla"
    monkeypatch.undo()
    # explicit choices ignore the auto conditions
    forced = DeepLabLargeFOV(ModelConfig(block1_impl="pallas"))
    assert forced._block1_mode(24, 321, 321, False) == "pallas"
    plain = DeepLabLargeFOV(ModelConfig(block1_impl="xla"))
    assert plain._block1_mode(6, 321, 321, True) == "xla"
    with pytest.raises(ValueError, match="expected 'auto'"):
        DeepLabLargeFOV(ModelConfig(block1_impl="bogus"))._block1_mode(
            6, 321, 321, True)


def test_forced_pallas_multidevice_without_mesh_warns(monkeypatch):
    """Advisor finding: forcing 'pallas' on >1 device without a mesh
    replicates the whole batch on every chip — must warn, not be silent."""
    forced = DeepLabLargeFOV(ModelConfig(block1_impl="pallas"))
    monkeypatch.setattr(jax, "device_count", lambda: 8)
    with pytest.warns(UserWarning, match="redundantly"):
        assert forced._block1_mode(6, 321, 321, True) == "pallas"


def _dp_mesh(shape=(2, 1)):
    import numpy as _np
    from jax.sharding import Mesh

    n = len(jax.devices())
    need = int(_np.prod(shape))
    if n < need:
        pytest.skip(f"needs >={need} (fake) devices")
    return Mesh(_np.asarray(jax.devices()[:need]).reshape(shape),
                ("data", "model"))


@pytest.mark.parametrize(
    "mesh_shape", [(2, 1), (1, 2)], ids=["dp2", "tp2only"]
)
def test_block1_fused_dp_matches_direct(mesh_shape):
    """shard_map composition: forward AND all four parameter cotangents
    of block1_fused_dp (dp2 mesh) match the unsharded kernel to f32
    reduction-order tolerance — including the psum over the data axis
    that shard_map's transpose inserts for the replicated weights.
    The tp2only arm pins the data-axis-size-1 contract (can_shard NOTE
    in models/deeplab.py): replicated input, kernel runs whole-batch on
    every model-chip, results identical."""
    from em_adapt_tpu.ops.block1_pallas import block1_fused_dp

    mesh = _dp_mesh(mesh_shape)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(4, 17, 17, 3)), jnp.float32)
    p = _params(rng, 3, 8)

    out_d = block1_fused(x, *p)
    out_s = jax.jit(lambda x, *p: block1_fused_dp(x, *p, mesh))(x, *p)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=1e-6, atol=1e-6)

    g_d = jax.grad(lambda p: jnp.sum(block1_fused(x, *p) ** 2))(p)
    g_s = jax.jit(
        jax.grad(lambda p: jnp.sum(block1_fused_dp(x, *p, mesh) ** 2))
    )(p)
    for name, a, b in zip(("w1", "b1", "w2", "b2"), g_d, g_s):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5,
            err_msg=f"d{name} mismatch under shard_map")
