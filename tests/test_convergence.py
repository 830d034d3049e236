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
SUPERVISED = os.path.join(REPO, "SUPERVISED.json")


def test_committed_rehearsal_artifact_passes():
    """The committed TPU rehearsal result must exist and pass its own
    contract (final mIoU well above the 0.19 all-background fixed point,
    nonzero foreground IoU = colors were learned from tags alone)."""
    assert os.path.exists(ARTIFACT), "run tools/convergence_rehearsal.py on TPU"
    with open(ARTIFACT) as f:
        r = json.load(f)
    assert r["pass"] is True
    assert r["final_miou"] >= 0.22
    assert r["mean_fg_iou"] >= 0.08
    assert r["final_miou"] > r["init_miou"]


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

    result = run_rehearsal(steps=1500)
    assert result["final_miou"] >= 0.22, result
    assert result["mean_fg_iou"] >= 0.08, result
