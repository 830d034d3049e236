"""Evaluation: confusion/mIoU, fixed and original-resolution protocols, CRF."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from em_adapt_tpu.config import EvalConfig, ExperimentConfig, ModelConfig  # noqa: E402
from em_adapt_tpu.eval.crf import dense_crf  # noqa: E402
from em_adapt_tpu.eval.miou import (  # noqa: E402
    ConfusionAccumulator,
    confusion_matrix,
    miou_from_confusion,
)


def test_confusion_matrix_ignores_void():
    gt = jnp.asarray([[0, 1, 255], [2, 1, 0]])
    pred = jnp.asarray([[0, 1, 1], [1, 1, 0]])
    cm = np.asarray(confusion_matrix(pred, gt, 3))
    assert cm.sum() == 5  # void pixel dropped
    assert cm[0, 0] == 2 and cm[1, 1] == 2 and cm[2, 1] == 1


def test_miou_known_values():
    cm = np.array([[3, 1, 0], [0, 4, 0], [0, 0, 0]], np.float64)
    miou, iou = miou_from_confusion(cm)
    # class0: 3/(4+0)=0.75 ... union = gt(4)+pred(3)-tp(3)=4 -> 0.75
    # class1: 4/(4+5-4)=0.8; class2 absent -> NaN excluded
    assert iou[0] == pytest.approx(0.75)
    assert iou[1] == pytest.approx(0.8)
    assert np.isnan(iou[2])
    assert miou == pytest.approx((0.75 + 0.8) / 2)


def test_accumulator_streams():
    acc = ConfusionAccumulator(3)
    acc.update(jnp.asarray([[0, 1]]), jnp.asarray([[0, 1]]))
    acc.update(jnp.asarray([[2, 2]]), jnp.asarray([[2, 1]]))
    miou, iou = acc.result()
    assert iou[0] == 1.0 and iou[2] == pytest.approx(0.5)


def test_accumulator_chunked_flush_matches_direct():
    """Device int32 accumulation + chunked int64 host flush must equal
    per-batch accumulation regardless of where flush boundaries fall."""
    import jax.numpy as jnp

    from em_adapt_tpu.eval.miou import ConfusionAccumulator

    g = np.random.default_rng(0)
    batches = [
        (g.integers(0, 4, size=(2, 9, 9)), g.integers(0, 6, size=(2, 9, 9)))
        for _ in range(7)
    ]
    a = ConfusionAccumulator(4, flush_every=3)
    b = ConfusionAccumulator(4, flush_every=1)
    for p, t in batches:
        a.update(jnp.asarray(p), jnp.asarray(t))
        b.update(jnp.asarray(p), jnp.asarray(t))
    ma, ia = a.result()
    mb, ib = b.result()
    assert ma == mb
    np.testing.assert_array_equal(
        np.nan_to_num(ia, nan=-1), np.nan_to_num(ib, nan=-1)
    )
    assert a._host.dtype == np.int64


def test_accumulator_flushes_on_pixel_budget(monkeypatch):
    """Review finding: flush_every bounds BATCHES per window, but int32
    overflow is bounded by PIXELS — a dominant cell (all-background) at
    large eval shapes wraps inside 128 batches. The accumulator must
    flush on a pixel budget independently of flush_every."""
    import jax.numpy as jnp

    from em_adapt_tpu.eval.miou import ConfusionAccumulator

    acc = ConfusionAccumulator(3, flush_every=1000)
    monkeypatch.setattr(ConfusionAccumulator, "_PIXEL_BUDGET", 200)
    p = jnp.zeros((2, 9, 9), jnp.int32)  # 162 pixels/batch, all cell [0,0]
    for _ in range(5):
        acc.update(p, p)
    # budget 200 forces a host flush before every second add
    assert int(acc._host[0, 0]) >= 2 * 162
    miou, _ = acc.result()
    assert int(acc._host[0, 0]) == 5 * 162 and miou == 1.0


def test_accumulator_update_host_matches_device():
    """update_host (used by the exact-VOC path, where per-image original
    shapes would retrace the jitted confusion_matrix) must produce the
    identical confusion totals, including void (>= C) masking."""
    import jax.numpy as jnp

    from em_adapt_tpu.eval.miou import ConfusionAccumulator

    g = np.random.default_rng(1)
    pairs = [
        (g.integers(0, 5, size=(h, w)),
         np.where(g.uniform(size=(h, w)) < 0.2, 255,
                  g.integers(0, 5, size=(h, w))))
        for h, w in [(7, 9), (15, 4), (33, 33)]
    ]
    dev = ConfusionAccumulator(5)
    host = ConfusionAccumulator(5)
    for p, t in pairs:
        dev.update(jnp.asarray(p), jnp.asarray(t))
        host.update_host(p, t)
    dev.result()
    host.result()
    np.testing.assert_array_equal(dev._host, host._host)


def test_evaluator_voc_tail_batch_single_trace(rng):
    """Round-3 review finding: a final partial chunk used to run
    _jit_logits at the leftover batch shape — a fresh multi-minute
    remote compile for one tail. The tail now pads to the full batch
    shape: a dataset of 3 with batch_size 2 must complete with EXACTLY
    one jit trace (and the result stays a valid mIoU — the pad rows are
    dropped before post-processing)."""
    from em_adapt_tpu.data.pipeline import SyntheticVOC
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8)
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ev = Evaluator(cfg, model)
    ds = SyntheticVOC(n=3, num_classes=4, seed=2, category="val")
    miou_tail, _ = ev.evaluate_voc(params, ds, use_crf=False, batch_size=2)
    assert 0.0 <= miou_tail <= 1.0
    assert ev._jit_logits._cache_size() == 1


def test_evaluator_fixed_and_voc(rng):
    from em_adapt_tpu.data.pipeline import SyntheticVOC, batch_iterator
    from em_adapt_tpu.config import DataConfig
    from em_adapt_tpu.eval.predict import Evaluator
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ExperimentConfig(
        model=ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8)
    )
    model = DeepLabLargeFOV(cfg.model)
    params = model.init(jax.random.key(0))
    ev = Evaluator(cfg, model)

    ds = SyntheticVOC(n=4, num_classes=4, seed=1, category="val")
    data_cfg = DataConfig(input_size=(33, 33), num_workers=2)
    batches = batch_iterator(ds, data_cfg, batch_size=2, seed=0, epochs=1, train=False)
    miou, iou = ev.evaluate_fixed(params, batches)
    assert 0.0 <= miou <= 1.0

    miou2, _ = ev.evaluate_voc(params, ds, use_crf=False, batch_size=2)
    assert 0.0 <= miou2 <= 1.0


def test_crf_sharpens_toward_unary_and_neighbors(rng):
    """A noisy probability map over a two-region image should be cleaned
    up by CRF: pixels flip toward their region's dominant class."""
    h, w, c = 40, 40, 3
    rgb = np.zeros((h, w, 3), np.uint8)
    rgb[:, : w // 2] = (200, 30, 30)
    rgb[:, w // 2 :] = (30, 30, 200)
    # unary: mostly class1 on the left, class2 on the right, with noise
    probs = np.full((h, w, c), 0.1, np.float32)
    probs[:, : w // 2, 1] = 0.8
    probs[:, w // 2 :, 2] = 0.8
    noise_mask = rng.uniform(size=(h, w)) < 0.15
    probs[noise_mask] = np.array([0.34, 0.33, 0.33])
    probs /= probs.sum(-1, keepdims=True)

    out = dense_crf(probs, rgb, EvalConfig(crf_bi_sxy=10.0, crf_bi_srgb=13.0), num_iterations=5)
    pred = out.argmax(-1)
    want = np.where(np.arange(w)[None, :] < w // 2, 1, 2)
    before = (probs.argmax(-1) == want).mean()
    after = (pred == want).mean()
    assert after >= before
    assert after > 0.95
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)
