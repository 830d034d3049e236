"""Pallas E-step kernel vs the numpy oracle and reference golden fixtures
(interpreter mode on CPU; the same kernel compiles for TPU)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from conftest import ESTEP_FIXTURES as FIXTURES  # noqa: E402
from conftest import load_estep_fixture as load  # noqa: E402
from em_adapt_tpu.ops.estep_oracle import estep_oracle  # noqa: E402
from em_adapt_tpu.ops.estep_pallas import estep_pallas  # noqa: E402


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_pallas_matches_reference(path):
    scores, label, orders, expected, kw = load(path)
    got = np.asarray(
        estep_pallas(
            jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders), **kw
        )
    )
    np.testing.assert_array_equal(got.argmax(3), expected.argmax(3))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=0)


def test_pallas_matches_oracle_random(rng):
    for (b, h, w, c) in [(2, 7, 9, 4), (3, 41, 41, 21)]:
        scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
        label = rng.integers(0, c + 3, size=(b, h, w)).astype(np.float32)
        label[label >= c] = 255.0
        orders = np.stack(
            [rng.permutation(np.arange(1, c)) for _ in range(3)]
        ).astype(np.int32)
        want = estep_oracle(scores, label, orders=orders, num_iter=3)
        got = np.asarray(
            estep_pallas(
                jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders), num_iter=3
            )
        )
        np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_pallas_batch_tiling_matches_oracle(rng, monkeypatch):
    """Force a tiny VMEM budget so the kernel grids over several batch
    tiles (incl. a padded final tile) — results must still match the
    oracle exactly (global-batch-max semantics are computed pre-tiling)."""
    import em_adapt_tpu.ops.estep_pallas as mod

    b, h, w, c = 20, 9, 9, 5
    per_image = (2 * c + 2) * h * w * 4
    # budget for 9 images -> 8-aligned grid tiles of 8, padded to 24
    monkeypatch.setattr(mod, "_TILE_BYTES", per_image * 9)
    assert mod.batch_tile(b, h * w, c) == 8

    scores = rng.normal(size=(b, h, w, c)).astype(np.float32) - 3.0  # all < 0
    label = rng.integers(0, c + 2, size=(b, h, w)).astype(np.float32)
    label[label >= c] = 255.0
    orders = np.stack(
        [rng.permutation(np.arange(1, c)) for _ in range(2)]
    ).astype(np.int32)
    want = estep_oracle(scores, label, orders=orders, num_iter=2)
    got = np.asarray(
        estep_pallas(
            jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders), num_iter=2
        )
    )
    np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_batch_tile_minimizes_padding():
    """Review finding: the largest fitting tile padded the folded
    production batch 30 up to 48 (60% dead kernel work); the tile choice
    must minimize grid padding instead, tie-broken toward fewer grid
    dispatches."""
    from em_adapt_tpu.ops.estep_pallas import batch_tile

    hw, c = 41 * 41, 21  # production shape: VMEM cap = 28 images/tile
    assert batch_tile(28, hw, c) == 28  # whole batch fits -> single tile
    assert batch_tile(30, hw, c) == 16  # 2x16 = 32 padded, not 2x24 = 48
    assert batch_tile(48, hw, c) == 24  # exact 2x24, zero padding
    assert batch_tile(96, hw, c) == 24  # 4x24 (the benchmarked layout)


def test_pallas_threshold_bitexact_single_class(rng):
    """With one present fg class and suppression off, the bias added to
    that channel must be the exact float np.partition selects."""
    b, h, w, c = 1, 8, 8, 3
    scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
    label = np.full((b, h, w), 2.0, dtype=np.float32)
    orders = np.array([[2, 1]], dtype=np.int32)
    got = np.asarray(
        estep_pallas(
            jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders),
            num_iter=1, suppress_others=False,
        )
    )
    want = estep_oracle(
        scores, label, orders=orders, num_iter=1, suppress_others=False
    )
    np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
    np.testing.assert_allclose(got, want, atol=2e-6, rtol=0)


def _mesh(shape, names):
    from jax.sharding import Mesh

    need = int(np.prod(shape))
    if len(jax.devices()) < need:
        pytest.skip(f"needs >= {need} (fake) devices")
    return Mesh(np.asarray(jax.devices()[:need]).reshape(shape), names)


@pytest.mark.parametrize(
    "shape,names",
    [
        ((2,), ("data",)),
        ((2, 2), ("data", "space")),
        ((2, 2, 2), ("data", "space", "model")),
        # TP-only: a data axis of size 1 still shard_maps (replicated
        # input -> every model-chip runs the full local batch, the same
        # redundancy the XLA path would have) — see the can_shard NOTE
        # in ops/estep.py.
        ((1, 2), ("data", "model")),
    ],
    ids=["dp2", "dp2xsp2", "dp2xsp2xtp2", "tp2only"],
)
def test_pallas_sharded_matches_oracle(rng, shape, names):
    """The shard_map-composed kernel (ops/estep.py::_estep_pallas_dp) on a
    multi-device mesh produces pixel-identical argmax label maps to the
    oracle — including the global-batch-max suppress semantics, which the
    wrapper hoists out of the manual region (one image's scores dominate
    the batch max here, so a LOCAL max would change the other shard's
    suppression and be caught)."""
    from em_adapt_tpu.ops.estep import _estep_pallas_dp

    mesh = _mesh(shape, names)
    b, h, w, c = 4, 9, 9, 5
    scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
    scores[0] += 50.0  # shard 0 owns the global max
    label = rng.integers(0, c + 2, size=(b, h, w)).astype(np.float32)
    label[label >= c] = 255.0
    orders = np.stack(
        [rng.permutation(np.arange(1, c)) for _ in range(3)]
    ).astype(np.int32)
    want = estep_oracle(scores, label, orders=orders, num_iter=3)
    kw = dict(bg_p=0.4, fg_p=0.2, num_iter=3, suppress_others=True,
              margin_others=1e-5)
    got = np.asarray(
        jax.jit(
            lambda s, l, o: _estep_pallas_dp(s, l, o, mesh, "data", kw)
        )(jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders))
    )
    np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_estep_labels_auto_gating(rng, monkeypatch):
    """'auto' composes with the topology: single device -> direct kernel;
    multi-device + mesh (divisible batch) -> shard_map; multi-device
    without a mesh -> XLA sort path; forcing 'pallas' without a mesh on
    multi-device warns about redundant replication."""
    import em_adapt_tpu.ops.estep as estep_mod
    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_labels, make_class_orders

    mesh = _mesh((2,), ("data",))
    b, h, w, c = 4, 8, 8, 4
    scores = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, c, size=(b, h, w)).astype(np.float32))
    orders = make_class_orders(jax.random.key(0), 2, c)

    calls = []
    # Stub the shard_map path (the real kernel is exercised by
    # test_pallas_sharded_matches_oracle; monkeypatching the backend to
    # "tpu" below would make the real kernel lower non-interpret on CPU).
    monkeypatch.setattr(
        estep_mod, "_estep_pallas_dp",
        lambda s, l, o, m, a, k: calls.append("dp") or estep_mod.estep(s, l, o, **k))
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    auto = EStepConfig(num_iter=2, impl="auto")
    # multi-device + mesh -> shard_map path engaged
    estep_labels(scores, label, orders, auto, mesh=mesh)
    assert calls == ["dp"]
    # batch 3 does not divide dp2 -> XLA path, no kernel call
    estep_labels(scores[:3], label[:3], orders, auto, mesh=mesh)
    assert calls == ["dp"]
    # multi-device without a mesh -> XLA path under auto
    monkeypatch.setattr(jax, "device_count", lambda: 8)
    estep_labels(scores, label, orders, auto)
    assert calls == ["dp"]
    # forced pallas without a mesh on multi-device: warn + replicated run
    # (backend back to cpu so the direct kernel call interprets)
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    with pytest.warns(UserWarning, match="redundantly"):
        estep_labels(scores, label, orders, EStepConfig(num_iter=2, impl="pallas"))


def test_pallas_estep_labels_under_grad(rng):
    """estep_labels with the pallas impl must be differentiable-through
    (inputs are stop-gradient'd BEFORE the kernel; a Pallas call has no JVP
    rule, so live tangents on its inputs would break jit(grad(...)))."""
    import jax.numpy as jnp

    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_labels, make_class_orders

    b, h, w, c = 2, 8, 8, 4
    scores = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, c, size=(b, h, w)).astype(np.float32))
    orders = make_class_orders(jax.random.key(0), 2, c)
    cfg = EStepConfig(num_iter=2, impl="pallas")

    def loss(x):
        weak = estep_labels(x, label, orders, cfg)
        return jnp.sum(x * weak.astype(jnp.float32)[..., None])

    g = jax.jit(jax.grad(loss))(scores)
    assert bool(jnp.isfinite(g).all())
