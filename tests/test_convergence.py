"""EM-dynamics convergence rehearsal (tools/convergence_rehearsal.py).

The full rehearsal needs a TPU (minutes there, hours on this 1-core CPU
host), so the suite checks the committed CONVERGENCE.json artifact on CPU
and re-runs the real thing only when a TPU backend is present.
"""

import json
import os

import pytest

jax = pytest.importorskip("jax")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "CONVERGENCE.json")
ABLATION = os.path.join(REPO, "CONVERGENCE_ABLATION.json")
SUPERVISED = os.path.join(REPO, "SUPERVISED.json")


def test_committed_rehearsal_artifact_passes():
    """The committed TPU rehearsal result must exist and pass the
    round-3 contract: PEAK mIoU a margin above the 0.19 all-background
    fixed point it cannot brush against, real per-class foreground IoU
    (colors learned from tags alone), and a final that HOLDS after the
    phase-2 warm-start refine — peak AND final are both recorded so EM
    drift cannot hide."""
    assert os.path.exists(ARTIFACT), "run tools/convergence_rehearsal.py on TPU"
    with open(ARTIFACT) as f:
        r = json.load(f)
    assert r["pass"] is True
    assert r["dropout_keep_prob"] == 0.5  # the reference's training recipe
    assert r["peak_miou"] >= 0.26
    assert r["peak_mean_fg_iou"] >= 0.15
    assert r["final_miou"] >= 0.24
    # refine consolidation (round-4 tightening): the phase-2 warm-start
    # fine-tune must END within 0.03 of the peak it restored
    assert r["final_miou"] >= r["peak_miou"] - 0.03
    assert r["final_miou"] > r["init_miou"]
    # best-of-N protocol (EM from random init locks at a HEAVY-TAILED
    # step — the init lottery and ulp-level numeric perturbations move
    # the abrupt label-locking anywhere in ~250..4000 steps, see
    # CONVERGENCE_LATE_LOCK.json; the reference's production workflow
    # always warm-starts from ImageNet features, which locks
    # immediately): every seed is recorded, the window covers the
    # measured lock-time tail (round 4: 4000 steps), and at least 4 of
    # 5 trajectories must lock in-window (round 3 required a simple
    # majority over a 2500-step window).
    assert len(r["seeds"]) >= 5
    assert r["steps"] >= 4000
    locked = [s for s in r["seeds"] if s["peak_miou"] >= 0.23]
    assert len(locked) >= -(-4 * len(r["seeds"]) // 5)


def test_committed_ablation_artifact_shows_bias_drives_lift():
    """The no-adaptive-bias arm (estep num_iter=0, suppression off —
    plain argmax self-training) must NOT reach the main arm's peak:
    the lift is attributable to the adaptive bias, not argmax drift."""
    assert os.path.exists(ABLATION), (
        "run tools/convergence_rehearsal.py --mode ablation on TPU"
    )
    with open(ABLATION) as f:
        a = json.load(f)
    with open(ARTIFACT) as f:
        r = json.load(f)
    assert a["pass"] is True
    assert a["estep_num_iter"] == 0 and a["suppress_others"] is False
    assert a["peak_miou"] < 0.24
    assert r["peak_miou"] - a["peak_miou"] >= 0.04


def test_committed_em_fixed_artifact_shows_adaptive_bias_is_load_bearing():
    """The EM-Fixed variant (estep.method='fixed', arXiv:1502.02734 §3.3)
    in BOTH regimes (round-4 protocol). From RANDOM init, every bias
    scale stays in the trivial range — the constant bias lacks the
    per-image scale adaptation that lets EM-Adapt bootstrap from
    nothing. WARM-STARTED from a partially-trained EM-Adapt best
    checkpoint (the paper's actual regime: EM-Fixed is only ever
    reported from pretrained features, Table 1: 20.8 vs 38.2), the
    probe's verdict is recorded either way: retention, or the measured
    erosion with a mechanism analysis (the constant logit-unit bias
    loses calibration as the logit spread grows; the rank-based
    adaptive threshold is the self-calibrating mechanism). Either
    outcome pins that the fixed path trains stably end-to-end and that
    the ADAPTIVE mechanism is the load-bearing one."""
    fixed = os.path.join(REPO, "CONVERGENCE_FIXED.json")
    assert os.path.exists(fixed), (
        "run tools/convergence_rehearsal.py --mode fixed on TPU"
    )
    with open(fixed) as f:
        x = json.load(f)
    with open(ARTIFACT) as f:
        r = json.load(f)
    assert x["pass"] is True
    assert x["estep_method"] == "fixed"
    # regime 1: cold sweep stays trivial at every bias scale
    assert len(x["bias_sweep"]) >= 3
    assert all(arm["peak_miou"] < 0.24 for arm in x["bias_sweep"])
    assert r["peak_miou"] - max(
        arm["peak_miou"] for arm in x["bias_sweep"]
    ) >= 0.04
    # regime 2: warm-started probe from a real prior, verdict recorded
    # on the FINAL state (a peak criterion would mistake slow erosion
    # for retention — the first post-restore eval still IS the prior)
    assert x["prior"]["peak_miou"] >= 0.26
    assert len(x["warm_start_sweep"]) >= 3
    assert isinstance(x["warm_start_retains"], bool)
    if x["warm_start_retains"]:
        assert x["warm_start_best_final"] >= 0.23
    else:
        # the documented negative: every bias scale must actually show
        # the decay-to-trivial the analysis describes, and the
        # mechanism note must be in the artifact
        assert all(a["final_miou"] < 0.24 for a in x["warm_start_sweep"])
        assert "erodes" in x["warm_start_verdict"]
    assert x["aborted_by_watchdog"] is None


def test_committed_supervised_artifact_passes():
    """The strong-pixel-mask arm (semi_supervised path) must reach real
    segmentation quality from 25 labeled images — the supervised-loss
    learning signal complementing the weak-tag EM one."""
    assert os.path.exists(SUPERVISED), (
        "run tools/convergence_rehearsal.py --mode strong on TPU"
    )
    with open(SUPERVISED) as f:
        r = json.load(f)
    assert r["pass"] is True
    assert r["final_miou"] >= 0.5
    assert r["final_miou"] > r["init_miou"] + 0.2


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="rehearsal needs a TPU (hours on 1-core CPU)")
def test_em_lifts_miou_above_chance_live():
    from tools.convergence_rehearsal import run_rehearsal

    result = run_rehearsal(steps=1500, lr_drop_epoch=None)
    assert result["peak_miou"] >= 0.22, result
    assert result["final_miou"] >= 0.2, result


def test_committed_em_fixed_spread_probe():
    """Round-4 VERDICT task #6: the control the erosion mechanism
    analysis implies — EM-Fixed with SPREAD-calibrated biases
    (estep.fixed_bias_units='spread': bias = kappa * per-image
    present-class score STD) warm-started from the same prior. The
    probe's outcome is recorded either way; these contracts pin that it
    RAN (4 kappa pairs incl. symmetric ones that neutralize the fg>bg
    asymmetry) and that the retention verdict recomputes from the
    recorded finals."""
    fixed = os.path.join(REPO, "CONVERGENCE_FIXED.json")
    assert os.path.exists(fixed)
    with open(fixed) as f:
        x = json.load(f)
    if "warm_spread_sweep" not in x:
        import pytest

        pytest.skip("pre-round-5 artifact (no spread probe)")
    sweep = x["warm_spread_sweep"]
    assert len(sweep) >= 4
    assert all(a["fixed_bias_units"] == "spread" for a in sweep)
    assert any(a["fixed_biases"][0] == a["fixed_biases"][1] for a in sweep)
    best_final = max(a["final_miou"] for a in sweep)
    assert x["warm_spread_best_final"] == best_final
    prior = x["prior"]["peak_miou"]
    assert x["warm_spread_retains"] == (
        best_final >= max(0.23, prior - 0.08)
    )
