"""On-device CRF (eval/crf_tpu.py) vs the host numpy/scipy path.

The TPU mean-field is the SAME algorithm as eval/crf.py's bilateral-grid
path (same Gaussian taps, same grid geometry, same coordinate rounding),
so these tests pin float-tolerance agreement — not the loose statistical
bounds the approximation tests use — plus the two properties the batched
bucket path relies on: bucket-padding invariance under the mask, and
vmap == per-image.
"""

import numpy as np

from em_adapt_tpu.config import EvalConfig
from em_adapt_tpu.eval.crf import (
    _bilateral_grid_filter,
    _gaussian_filter_xy,
    dense_crf,
)
from em_adapt_tpu.eval.crf_tpu import (
    _bilateral_grid_filter_tpu,
    _gauss_taps,
    _spatial_filter,
    dense_crf_tpu,
    make_crf_tpu,
)
from tests.test_crf import _two_region_case


def test_spatial_filter_matches_scipy():
    probs, _ = _two_region_case()
    cfg = EvalConfig()
    import jax.numpy as jnp

    mask = jnp.ones(probs.shape[:2] + (1,), jnp.float32)
    got = np.asarray(
        _spatial_filter(jnp.asarray(probs), mask, _gauss_taps(cfg.crf_g_sxy, 4.0))
    )
    want = _gaussian_filter_xy(probs, cfg.crf_g_sxy)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_bilateral_grid_filter_matches_numpy():
    probs, rgb = _two_region_case()
    cfg = EvalConfig()
    import jax.numpy as jnp

    mask = jnp.ones(probs.shape[:2] + (1,), jnp.float32)
    got = np.asarray(
        _bilateral_grid_filter_tpu(
            jnp.asarray(probs),
            jnp.asarray(rgb),
            mask,
            sxy=cfg.crf_bi_sxy,
            srgb=cfg.crf_bi_srgb,
            taps=_gauss_taps(1.0, 2.0),
        )
    )
    want = _bilateral_grid_filter(probs, rgb, cfg.crf_bi_sxy, cfg.crf_bi_srgb)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_dense_crf_tpu_matches_host_grid_end_to_end():
    for seed in range(3):
        probs, rgb = _two_region_case(seed=seed)
        cfg = EvalConfig()
        got = dense_crf_tpu(probs, rgb, cfg)
        want = dense_crf(probs, rgb, cfg, method="grid")
        assert (got.argmax(-1) == want.argmax(-1)).all(), f"seed {seed}"
        assert np.abs(got - want).max() < 1e-4


def test_bucket_padding_is_invisible_under_mask():
    """Padding an image into a larger bucket (mask=0 on the pad) must not
    change any valid pixel — the property the batched eval path needs."""
    probs, rgb = _two_region_case()
    h, w, c = probs.shape
    cfg = EvalConfig()
    base = dense_crf_tpu(probs, rgb, cfg)

    ph, pw = h + 9, w + 7
    probs_p = np.zeros((ph, pw, c), np.float32)
    probs_p[:h, :w] = probs
    rgb_p = np.zeros((ph, pw, 3), np.uint8)
    rgb_p[:h, :w] = rgb
    mask = np.zeros((ph, pw), np.float32)
    mask[:h, :w] = 1.0
    padded = dense_crf_tpu(probs_p, rgb_p, cfg, mask=mask)
    np.testing.assert_allclose(padded[:h, :w], base, atol=1e-5)


def test_batched_matches_per_image():
    cfg = EvalConfig()
    cases = [_two_region_case(seed=s) for s in range(3)]
    probs = np.stack([p for p, _ in cases])
    rgbs = np.stack([r for _, r in cases])
    masks = np.ones(probs.shape[:3], np.float32)
    fn = make_crf_tpu(cfg)
    batched = np.asarray(fn(probs, rgbs, masks))
    for i, (p, r) in enumerate(cases):
        single = dense_crf_tpu(p, r, cfg)
        np.testing.assert_allclose(batched[i], single, atol=1e-6)


def test_resize_bilinear_dynamic_matches_static():
    """The traced-size upsampler must reproduce the static TF1-grid op on
    the valid region for every size in the bucket (the 1-ulp division
    caveat in its docstring is about TPU lowering; CPU divides IEEE)."""
    import jax.numpy as jnp

    from em_adapt_tpu.ops.resize import (
        resize_bilinear_tf,
        resize_bilinear_tf_dynamic,
    )

    rng = np.random.default_rng(3)
    x = rng.normal(size=(9, 11, 4)).astype(np.float32)
    bucket = (37, 41)
    for oh, ow in [(37, 41), (20, 33), (9, 11), (36, 13), (1, 1)]:
        got = np.asarray(
            resize_bilinear_tf_dynamic(
                jnp.asarray(x), jnp.asarray([oh, ow], np.int32), bucket
            )
        )[:oh, :ow]
        want = np.asarray(resize_bilinear_tf(jnp.asarray(x), (oh, ow)))
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


class _TinyVOC:
    """Three tiny variable-size images (CPU-sized stand-in for
    SyntheticVOC, whose 200-500 px rasters make a 10-iteration CRF test
    too slow on the 1-core rig)."""

    sizes = [(40, 50), (33, 44), (48, 37)]

    def __len__(self):
        return len(self.sizes)

    def load_raw(self, i):
        h, w = self.sizes[i]
        g = np.random.default_rng(77 + i)
        img = g.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        label = g.integers(0, 4, size=(h, w)).astype(np.uint8)
        label[: h // 8] = 255
        return img, label


def test_evaluate_voc_device_path():
    """crf_impl='tpu' end-to-end: the batched on-device post-process must
    reproduce the host pipeline (TF1 upsample + grid CRF + argmax) per
    image, and the driver must survive a tail batch."""
    import jax

    from em_adapt_tpu.config import EvalConfig, ExperimentConfig, ModelConfig
    from em_adapt_tpu.data.augment import resize_bilinear_np
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        eval=EvalConfig(
            crf_impl="tpu", crf_bucket=(48, 56), crf_iterations=2, use_crf=True
        ),
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ev = Evaluator(cfg, model)
    ds = _TinyVOC()

    miou, _ = ev.evaluate_voc(params, ds, use_crf=True, batch_size=2)
    assert 0.0 <= miou <= 1.0
    assert ev._jit_logits._cache_size() == 1

    # per-image parity vs the host pipeline (grid method = same algorithm)
    import jax.numpy as jnp

    post = ev._make_device_voc_post(cfg.eval.crf_bucket)
    for i in range(len(ds)):
        raw_img, raw_label = ds.load_raw(i)
        oh, ow = raw_label.shape[:2]
        from em_adapt_tpu.data.augment import preprocess_eval

        img, _ = preprocess_eval(raw_img, None, input_size=(33, 33))
        lg = np.asarray(ev._jit_logits(params, jnp.asarray(img[None])))[0]
        bh, bw = cfg.eval.crf_bucket
        rgb_p = np.zeros((bh, bw, 3), np.uint8)
        rgb_p[:oh, :ow] = raw_img
        got = np.asarray(
            post(
                jnp.asarray(lg[None]),
                jnp.asarray(rgb_p[None]),
                jnp.asarray([[oh, ow]], np.int32),
            )
        )[0, :oh, :ow]

        up = resize_bilinear_np(lg.astype(np.float32), (oh, ow))
        e = np.exp(up - up.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        want = dense_crf(
            probs, raw_img, cfg.eval, num_iterations=2, method="grid"
        ).argmax(-1)
        agree = (got == want).mean()
        assert agree > 0.999, f"image {i}: agreement {agree}"


def test_evaluate_voc_device_bucket_routing():
    """Size-bucketed device eval: images pad into the smallest fitting
    crf_buckets shape, the fallback bucket is untouched when unused, and
    the confusion matrix is IDENTICAL to the single-bucket run (the masked
    CRF is exactly padding-invariant: padding only adds 0.0 terms to the
    filter sums and empty cells to the bilateral grid)."""
    import jax

    from em_adapt_tpu.config import EvalConfig, ExperimentConfig, ModelConfig
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    model_cfg = ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8)

    def run(buckets):
        cfg = ExperimentConfig(
            model=model_cfg,
            eval=EvalConfig(
                crf_impl="tpu",
                crf_bucket=(48, 56),
                crf_buckets=buckets,
                crf_iterations=2,
                use_crf=True,
            ),
        )
        model = DeepLabLargeFOV(cfg.model)
        params = model.init(jax.random.key(0))
        ev = Evaluator(cfg, model)
        compiled = []
        orig = ev._make_device_voc_post

        def spy(bucket):
            compiled.append(tuple(bucket))
            return orig(bucket)

        ev._make_device_voc_post = spy
        miou, conf = ev.evaluate_voc(params, _TinyVOC(), use_crf=True, batch_size=2)
        return miou, conf, compiled

    # _TinyVOC sizes: (40,50)->(40,56), (33,44)->(40,56), (48,37)->(56,40)
    miou_b, conf_b, compiled = run(((40, 56), (56, 40)))
    assert sorted(compiled) == [(40, 56), (56, 40)]  # fallback never compiled
    miou_s, conf_s, compiled_s = run(())
    assert compiled_s == [(48, 56)]
    assert miou_b == miou_s
    np.testing.assert_array_equal(conf_b, conf_s)

    # Buckets that exceed the crf_bucket ceiling are ignored, keeping the
    # oversize check authoritative.
    _, conf_big, compiled_big = run(((400, 400), (40, 56)))
    assert (400, 400) not in compiled_big
    np.testing.assert_array_equal(conf_big, conf_s)


def test_evaluate_voc_device_rejects_oversize_image():
    import jax
    import pytest

    from em_adapt_tpu.config import EvalConfig, ExperimentConfig, ModelConfig
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8),
        eval=EvalConfig(crf_impl="tpu", crf_bucket=(16, 16), crf_iterations=1),
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ev = Evaluator(cfg, model)
    with pytest.raises(ValueError, match="crf_bucket"):
        ev.evaluate_voc(params, _TinyVOC(), use_crf=True, batch_size=2)


def test_dense_crf_tpu_method_dispatch():
    """dense_crf(method='tpu') routes to the device implementation."""
    probs, rgb = _two_region_case()
    cfg = EvalConfig()
    got = dense_crf(probs, rgb, cfg, method="tpu")
    want = dense_crf_tpu(probs, rgb, cfg)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_committed_fault_fixture_refines_through_shipped_path():
    """Regression guard for the round-4 XLA:TPU fault: jax.vmap's
    batched-scatter lowering of the bilateral splat crashed the TPU
    worker on EXACTLY these committed inputs (each image passes
    individually; tools/repro_crf_tpu_fault.py reproduces both
    outcomes on real hardware). The shipped formulation serializes the
    batch via lax.map; this test keeps the fixture loadable and that
    path refining it to valid probabilities (CPU backend — the fault
    itself is TPU-runtime-only)."""
    import os

    import jax.numpy as jnp

    from em_adapt_tpu.eval.crf_tpu import make_crf_tpu

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "crf_tpu_fault_inputs.npz")
    d = np.load(path)
    probs, rgb = d["probs"][:2], d["rgb"][:2]  # 2 of the 6 (CPU budget)
    assert probs.shape[1:] == (129, 129, 4) and rgb.dtype == np.uint8
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    fn = make_crf_tpu(EvalConfig(), num_iterations=2)
    out = np.asarray(
        fn(jnp.asarray(probs), jnp.asarray(rgb),
           jnp.ones(probs.shape[:3], jnp.float32))
    )
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-4)
