"""E-step correctness: numpy oracle and JAX implementation vs the golden
fixtures generated from the upstream reference's estep_py
(tests/fixtures/generate_goldens.py), plus algorithmic property tests.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from conftest import ESTEP_FIXTURES as FIXTURES  # noqa: E402
from conftest import load_estep_fixture as load  # noqa: E402
from em_adapt_tpu.ops.estep import (  # noqa: E402
    derive_tags as derive_tags_jax,
    estep as estep_jax,
    make_class_orders,
)
from em_adapt_tpu.ops.estep_oracle import derive_tags, estep_oracle  # noqa: E402


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_oracle_bitexact_vs_reference(path):
    scores, label, orders, expected, kw = load(path)
    got = estep_oracle(scores, label, orders=orders, **kw)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p) for p in FIXTURES])
def test_jax_matches_reference(path):
    scores, label, orders, expected, kw = load(path)
    got = np.asarray(estep_jax(jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders), **kw))
    # Label maps (channel argmax) must be pixel-exact.
    np.testing.assert_array_equal(got.argmax(axis=3), expected.argmax(axis=3))
    # Values match to float tolerance (the final constant shift's mean
    # reduction order is the only arithmetic difference).
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=0)


def test_jax_matches_oracle_random_orders(rng):
    """Random shapes/orders beyond the committed fixtures."""
    for (b, h, w, c) in [(1, 5, 7, 4), (4, 9, 9, 8), (2, 41, 41, 21)]:
        scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
        label = rng.integers(0, c + 2, size=(b, h, w)).astype(np.float32)
        label[label >= c] = 255.0
        orders = np.stack([rng.permutation(np.arange(1, c)) for _ in range(3)]).astype(np.int32)
        want = estep_oracle(scores, label, orders=orders, num_iter=3)
        got = np.asarray(
            estep_jax(jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders), num_iter=3)
        )
        np.testing.assert_array_equal(got.argmax(3), want.argmax(3))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=0)


def test_estep_labels_rejects_unknown_impl(rng):
    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_labels

    scores = jnp.asarray(rng.normal(size=(1, 5, 5, 4)).astype(np.float32))
    label = jnp.zeros((1, 5, 5), jnp.float32)
    orders = make_class_orders(jax.random.key(0), 5, 4)
    with pytest.raises(ValueError, match="estep.impl"):
        estep_labels(scores, label, orders, EStepConfig(impl="cuda"))


def test_estep_labels_native_impl_matches_jax(rng):
    """impl='native' routes the host C++ kernel through pure_callback inside
    jit and must produce the same weak-label map as the XLA path."""
    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_labels

    scores = jnp.asarray(rng.normal(size=(2, 9, 9, 6)).astype(np.float32))
    label_np = rng.integers(0, 8, size=(2, 9, 9)).astype(np.float32)
    label_np[label_np >= 6] = 255.0
    label = jnp.asarray(label_np)
    orders = make_class_orders(jax.random.key(1), 5, 6)

    fn = jax.jit(lambda s, l, o, impl: estep_labels(s, l, o, EStepConfig(impl=impl)),
                 static_argnames="impl")
    want = np.asarray(fn(scores, label, orders, "jax"))
    got = np.asarray(fn(scores, label, orders, "native"))
    np.testing.assert_array_equal(got, want)


def test_tags_ignore_label(rng):
    label = np.full((2, 6, 6), 255.0, dtype=np.float32)
    label[0, 0, 0] = 3
    label[1, :, :] = 0
    tags = derive_tags(label, 5)
    assert tags[0].tolist() == [0, 0, 0, 1, 0]
    assert tags[1].tolist() == [1, 0, 0, 0, 0]
    jt = np.asarray(derive_tags_jax(jnp.asarray(label), 5))
    np.testing.assert_array_equal(jt, tags.astype(np.float32))


def test_bias_selects_expected_pixel_fraction(rng):
    """After one round, ~rho*H*W pixels should prefer each present class."""
    b, h, w, c = 1, 16, 16, 3
    scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
    label = np.zeros((b, h, w), dtype=np.float32)
    label[:, :8] = 1  # classes {0, 1} present
    orders = np.array([[1, 2]], dtype=np.int32)
    out = estep_oracle(
        scores, label, orders=orders, num_iter=1, bg_p=0.4, fg_p=0.2
    )
    pred = out.argmax(3)
    # Class 2 is absent: it must never win.
    assert not (pred == 2).any()
    # Class 1 (visited last, rank int(256*0.2)=51) gets at least its quota.
    assert (pred == 1).sum() >= 51


def test_recentering_preserves_mean_max(rng):
    scores = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    label = rng.integers(0, 4, size=(2, 8, 8)).astype(np.float32)
    orders = np.stack([rng.permutation(np.arange(1, 4)) for _ in range(2)])
    out = estep_oracle(scores, label, orders=orders, num_iter=2)
    # mean-of-per-pixel-max is preserved vs post-suppression map
    from em_adapt_tpu.ops.estep_oracle import suppress_absent

    sup = suppress_absent(scores, derive_tags(label, 4), 1e-5)
    np.testing.assert_allclose(
        out.max(3).mean((1, 2)), sup.max(3).mean((1, 2)), atol=1e-4
    )


def test_make_class_orders():
    orders = np.asarray(make_class_orders(jax.random.key(0), 5, 21))
    assert orders.shape == (5, 20)
    for row in orders:
        assert sorted(row.tolist()) == list(range(1, 21))


def test_absent_everything_reduces_to_suppression(rng):
    """All-ignore label: no class is present so no bias is applied; the
    E-step degenerates to the suppression clamp alone (which, per the
    reference's formula, still fires where f > per-pixel-min + global-max).
    """
    from em_adapt_tpu.ops.estep_oracle import suppress_absent

    scores = rng.normal(size=(1, 6, 6, 4)).astype(np.float32)
    label = np.full((1, 6, 6), 255.0, dtype=np.float32)
    orders = np.array([[1, 2, 3]], dtype=np.int32)
    out = estep_oracle(scores, label, orders=orders, num_iter=1)
    want = suppress_absent(scores, np.zeros((1, 4), np.uint8), 1e-5)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_estep_zero_iterations_reduces_to_suppressed_argmax(rng):
    """num_iter=0 (the convergence-rehearsal ablation arm): no bias
    rounds — all three implementations must agree with the oracle's
    suppress-only result."""
    import jax
    import jax.numpy as jnp

    from em_adapt_tpu.ops.estep import estep, make_class_orders
    from em_adapt_tpu.ops.estep_oracle import estep_oracle
    from em_adapt_tpu.ops.estep_pallas import estep_pallas

    b, h, w, c = 2, 9, 9, 5
    scores = rng.normal(size=(b, h, w, c)).astype(np.float32)
    label = rng.integers(0, c, size=(b, h, w)).astype(np.float32)
    orders = np.asarray(make_class_orders(jax.random.key(0), 0, c))
    assert orders.shape == (0, c - 1)
    want = estep_oracle(scores, label, orders=orders, num_iter=0)
    j = np.asarray(estep(jnp.asarray(scores), jnp.asarray(label),
                         jnp.asarray(orders), num_iter=0))
    p = np.asarray(estep_pallas(jnp.asarray(scores), jnp.asarray(label),
                                jnp.asarray(orders), num_iter=0))
    np.testing.assert_array_equal(j.argmax(3), want.argmax(3))
    np.testing.assert_array_equal(p.argmax(3), want.argmax(3))


def test_edge_parameter_fuzz_all_impls_agree(rng):
    """Edge-of-parameter-space fuzz across oracle / JAX / native (when
    built): the regimes where the reference's own native kernel was
    broken — ALL-NEGATIVE score maps (its FLT_MIN running-max seed),
    extreme percentiles (k = int(HW*p) at 0 and near HW), single-class
    images, suppression off, zero margin. Argmax must stay
    pixel-identical; scores to the documented 2e-5."""
    from em_adapt_tpu.ops.estep_native import estep_native, _load

    try:
        _load()
        have_native = True
    except Exception:
        have_native = False  # no toolchain on this host
    cases = [
        # (b, h, w, c, bg_p, fg_p, suppress, margin, score_offset)
        (2, 7, 9, 5, 0.0, 0.0, True, 1e-5, 0.0),       # k=0: bias = min diff
        (2, 7, 9, 5, 0.99, 0.99, True, 1e-5, 0.0),     # k near HW
        (3, 11, 11, 6, 0.4, 0.2, True, 1e-5, -100.0),  # all-negative scores
        (2, 8, 8, 4, 0.4, 0.2, False, 1e-5, 0.0),      # suppression off
        (2, 8, 8, 4, 0.4, 0.2, True, 0.0, 0.0),        # zero margin
        (1, 5, 5, 3, 0.7, 0.1, True, 1.0, 50.0),       # huge margin/offset
    ]
    for i, (b, h, w, c, bg, fg, sup, margin, off) in enumerate(cases):
        scores = (rng.normal(size=(b, h, w, c)) + off).astype(np.float32)
        label = rng.integers(0, c + 2, size=(b, h, w)).astype(np.float32)
        label[label >= c] = 255.0
        if i == 2:
            label[0] = 0.0  # single-class (bg-only) image in the batch
        orders = np.stack(
            [rng.permutation(np.arange(1, c)) for _ in range(4)]
        ).astype(np.int32)
        kw = dict(bg_p=bg, fg_p=fg, num_iter=4, suppress_others=sup,
                  margin_others=margin)
        want = estep_oracle(scores, label, orders=orders, **kw)
        # The HARD contract is the argmax label map (pixel-identical).
        # Scores carry f32 reduction-order noise proportional to their
        # magnitude (the ~2e-5 figure is for O(1) production-scale
        # maps), so the score tolerance scales with max|score|.
        atol = 2e-5 * max(1.0, float(np.abs(want).max()))
        got = np.asarray(estep_jax(
            jnp.asarray(scores), jnp.asarray(label), jnp.asarray(orders), **kw
        ))
        np.testing.assert_array_equal(
            got.argmax(3), want.argmax(3), err_msg=f"case {i}: jax argmax"
        )
        np.testing.assert_allclose(got, want, atol=atol, rtol=0,
                                   err_msg=f"case {i}: jax scores")
        if have_native:
            nat = estep_native(scores, label.astype(np.int32), orders, **kw)
            np.testing.assert_array_equal(
                nat.argmax(3), want.argmax(3),
                err_msg=f"case {i}: native argmax",
            )
            np.testing.assert_allclose(nat, want, atol=atol, rtol=0,
                                       err_msg=f"case {i}: native scores")


def test_estep_fixed_matches_hand_computation(rng):
    """EM-Fixed (arXiv:1502.02734 §3.3): present classes get a constant
    bias (bg/fg), absent classes none — checked against a direct numpy
    computation, suppression on and off."""
    from em_adapt_tpu.ops.estep import estep_fixed

    g = np.random.default_rng(11)
    b, h, w, c = 2, 6, 5, 4
    scores = g.normal(size=(b, h, w, c)).astype(np.float32)
    # image 0 has classes {0, 2}; image 1 has {1, 3} (no background)
    label = np.zeros((b, h, w), np.float32)
    label[0, 2:, :] = 2.0
    label[1] = 1.0
    label[1, :, 3:] = 3.0
    tags = np.zeros((b, c), np.float32)
    tags[0, [0, 2]] = 1.0
    tags[1, [1, 3]] = 1.0

    for suppress in (False, True):
        f = scores.astype(np.float32).copy()
        if suppress:
            gmax = f.max()
            lifted = f + np.where(tags[:, None, None, :] > 0, 0.0, gmax)
            pmin = lifted.min(axis=3, keepdims=True)
            clamp = (tags[:, None, None, :] == 0) & (f > pmin)
            f = np.where(clamp, pmin - np.float32(1e-5), f)
        per_class = np.where(np.arange(c) == 0, 3.25, 7.5).astype(np.float32)
        want = f + (tags * per_class)[:, None, None, :]
        got = np.asarray(
            estep_fixed(
                jnp.asarray(scores), jnp.asarray(label),
                bg_bias=3.25, fg_bias=7.5, suppress_others=suppress,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_estep_labels_fixed_method_predicts_only_present_classes(rng):
    """With suppression on and positive biases, an absent class can never
    win the argmax (clamped below the present min, then present classes
    move further up); and the label map equals the argmax of estep_fixed."""
    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_fixed, estep_labels

    g = np.random.default_rng(5)
    b, h, w, c = 3, 8, 8, 6
    scores = jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32) * 4)
    label = np.zeros((b, h, w), np.float32)
    label[0] = 255.0  # no tags at all in image 0 -> nothing suppressed
    label[1, :4] = 2.0
    label[2, :, :2] = 4.0
    label[2, :, 2:] = 5.0
    cfg = EStepConfig(method="fixed", fixed_bg_bias=2.0, fixed_fg_bias=4.0)
    got = np.asarray(estep_labels(scores, jnp.asarray(label), None, cfg))
    want = np.asarray(
        estep_fixed(scores, jnp.asarray(label), bg_bias=2.0, fg_bias=4.0)
    ).argmax(-1)
    np.testing.assert_array_equal(got, want)
    # images 1 and 2 have tags {0,2} and {0,4,5}: predictions stay inside
    assert set(np.unique(got[1])) <= {0, 2}
    assert set(np.unique(got[2])) <= {0, 4, 5}


def test_estep_labels_rejects_unknown_method(rng):
    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_labels

    scores = jnp.zeros((1, 4, 4, 3), jnp.float32)
    label = jnp.zeros((1, 4, 4), jnp.float32)
    with pytest.raises(ValueError, match="estep.method"):
        estep_labels(scores, label, None, EStepConfig(method="typo"))


def test_trainer_step_with_fixed_method(rng):
    """method='fixed' trains end-to-end (the E-step swap is config-only)."""
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
    trainer = Trainer(cfg, steps_per_epoch=4)
    state = trainer.init_state()
    g = np.random.default_rng(0)
    batch = {
        "image": g.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "label": g.integers(0, 4, size=(8, 32, 32, 1)).astype(np.float32),
    }
    state, m = trainer.train_step(state, trainer.plan.shard_batch(batch))
    assert np.isfinite(float(jax.device_get(m["loss"])))


def test_estep_fixed_spread_units_hand_computation(rng):
    """bias_units='spread': the bias is kappa * (per-image masked STD of
    the present-class scores) — checked against a direct numpy moment
    computation (suppression off so the score map is untouched)."""
    from em_adapt_tpu.ops.estep import estep_fixed

    g = np.random.default_rng(23)
    b, h, w, c = 2, 7, 6, 5
    scores = (g.normal(size=(b, h, w, c)) * 3).astype(np.float32)
    label = np.zeros((b, h, w), np.float32)
    label[0, :3] = 2.0                  # image 0: classes {0, 2}
    label[1] = 1.0
    label[1, :, 4:] = 4.0               # image 1: classes {1, 4} (no bg)
    tags = np.zeros((b, c), np.float32)
    tags[0, [0, 2]] = 1.0
    tags[1, [1, 4]] = 1.0

    mask = tags[:, None, None, :]
    n = tags.sum(1) * (h * w)
    mean = (scores * mask).sum(axis=(1, 2, 3)) / n
    var = (mask * (scores - mean[:, None, None, None]) ** 2).sum(
        axis=(1, 2, 3)
    ) / n
    std = np.sqrt(var)
    per_class = np.where(np.arange(c) == 0, 1.5, 2.5).astype(np.float32)
    want = scores + (tags * per_class)[:, None, None, :] * std[:, None, None, None]
    got = np.asarray(
        estep_fixed(
            jnp.asarray(scores), jnp.asarray(label), bg_bias=1.5,
            fg_bias=2.5, suppress_others=False, bias_units="spread",
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)


def test_estep_fixed_spread_units_scale_equivariant(rng):
    """The calibration property the logit-unit variant lacks (the round-4
    erosion mechanism, CONVERGENCE_FIXED.json): under 'spread' units a
    global rescale of the score map rescales the bias identically, so
    the E-step's DECISIONS are invariant to how sharp the logits have
    grown. Exact equivariance with suppression off; argmax invariance
    with the full default path (the suppression margin is a non-scaling
    1e-5 constant)."""
    from em_adapt_tpu.ops.estep import estep_fixed

    g = np.random.default_rng(31)
    b, h, w, c = 2, 8, 8, 4
    scores = g.normal(size=(b, h, w, c)).astype(np.float32)
    label = g.integers(0, c, size=(b, h, w)).astype(np.float32)
    kw = dict(bg_bias=3.0, fg_bias=5.0, bias_units="spread")
    base = np.asarray(
        estep_fixed(jnp.asarray(scores), jnp.asarray(label),
                    suppress_others=False, **kw)
    )
    for alpha in (0.25, 16.0):
        scaled = np.asarray(
            estep_fixed(jnp.asarray(scores * alpha), jnp.asarray(label),
                        suppress_others=False, **kw)
        )
        np.testing.assert_allclose(scaled, base * alpha, rtol=3e-5,
                                   atol=1e-4 * alpha)
    full = np.asarray(
        estep_fixed(jnp.asarray(scores), jnp.asarray(label), **kw)
    ).argmax(-1)
    for alpha in (0.25, 16.0):
        got = np.asarray(
            estep_fixed(jnp.asarray(scores * alpha), jnp.asarray(label), **kw)
        ).argmax(-1)
        np.testing.assert_array_equal(got, full)


def test_estep_labels_fixed_spread_units_flow_through_config(rng):
    """estep.fixed_bias_units='spread' reaches the kernel via
    estep_labels, and an unknown unit string is a hard error."""
    from em_adapt_tpu.config import EStepConfig
    from em_adapt_tpu.ops.estep import estep_fixed, estep_labels

    g = np.random.default_rng(3)
    scores = jnp.asarray(g.normal(size=(2, 6, 6, 4)).astype(np.float32))
    label = jnp.asarray(g.integers(0, 4, size=(2, 6, 6)).astype(np.float32))
    cfg = EStepConfig(method="fixed", fixed_bias_units="spread",
                      fixed_bg_bias=1.0, fixed_fg_bias=2.0)
    got = np.asarray(estep_labels(scores, label, None, cfg))
    want = np.asarray(
        estep_fixed(scores, label, bg_bias=1.0, fg_bias=2.0,
                    bias_units="spread")
    ).argmax(-1)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError, match="bias_units"):
        estep_fixed(scores, label, bias_units="typo")
