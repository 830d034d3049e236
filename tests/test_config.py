"""Config tree: CLI override semantics."""

import pytest

from em_adapt_tpu.config import ExperimentConfig, apply_overrides


def test_override_syncs_model_and_data_input_size():
    """model.input_size and data.input_size are the same quantity at two
    consumers (trace shape vs pipeline resize target); overriding either
    must sync the other or training would silently run at one resolution
    and eval/export at another."""
    cfg = ExperimentConfig()
    c1 = apply_overrides(cfg, ["model.input_size=(129,129)"])
    assert c1.model.input_size == (129, 129)
    assert c1.data.input_size == (129, 129)
    c2 = apply_overrides(cfg, ["data.input_size=(193,193)"])
    assert c2.model.input_size == (193, 193)
    assert c2.data.input_size == (193, 193)


def test_override_conflicting_input_sizes_is_an_error():
    with pytest.raises(ValueError, match="same quantity"):
        apply_overrides(
            ExperimentConfig(),
            ["model.input_size=(129,129)", "data.input_size=(193,193)"],
        )


def test_override_same_input_size_both_keys_ok():
    c = apply_overrides(
        ExperimentConfig(),
        ["model.input_size=(129,129)", "data.input_size=(129,129)"],
    )
    assert c.model.input_size == c.data.input_size == (129, 129)


def test_override_unrelated_keys_untouched():
    c = apply_overrides(ExperimentConfig(), ["optim.base_lr=0.01"])
    assert c.optim.base_lr == 0.01
    assert c.model.input_size == c.data.input_size == (321, 321)
