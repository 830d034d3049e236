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


def test_override_natural_bool_spellings():
    """'false' (lowercase, as JSON/YAML users write it) must turn the
    bool OFF — not store a truthy string that silently keeps suppression
    on while the user believes it is off."""
    c = apply_overrides(ExperimentConfig(), ["estep.suppress_others=false"])
    assert c.estep.suppress_others is False
    c = apply_overrides(c, ["estep.suppress_others=TRUE"])
    assert c.estep.suppress_others is True


def test_override_natural_none_spelling():
    c = apply_overrides(
        ExperimentConfig(), ["train.eval_every_steps=500"]
    )
    assert c.train.eval_every_steps == 500
    c = apply_overrides(c, ["train.eval_every_steps=none"])
    assert c.train.eval_every_steps is None


def test_override_unparseable_value_for_typed_field_is_an_error():
    with pytest.raises(ValueError, match="cannot interpret"):
        apply_overrides(ExperimentConfig(), ["optim.base_lr=fast"])
    with pytest.raises(ValueError, match="does not match"):
        apply_overrides(ExperimentConfig(), ["estep.suppress_others=(1,2)"])


def test_override_bare_string_ok_for_string_fields():
    c = apply_overrides(ExperimentConfig(), ["estep.impl=pallas"])
    assert c.estep.impl == "pallas"
    c = apply_overrides(
        ExperimentConfig(), ["model.init_model_path=/tmp/init.npy"]
    )
    assert c.model.init_model_path == "/tmp/init.npy"


def test_override_int_promotes_to_float_field():
    c = apply_overrides(ExperimentConfig(), ["optim.base_lr=1"])
    assert c.optim.base_lr == 1.0 and isinstance(c.optim.base_lr, float)


def test_tpu_highres_preset_is_the_spatial_recipe():
    """The SPATIAL.json when-to-use guidance as a product preset (round-4
    review): space=3 + remat + 513² input + the tpu-perf execution
    levers, with labels left full-res (the 513² score map is 65²)."""
    from em_adapt_tpu.cli import train_presets

    presets = train_presets()
    assert set(presets) == {
        "reference", "tpu-perf", "tpu-perf-fold", "tpu-highres"
    }
    cfg = apply_overrides(ExperimentConfig(), presets["tpu-highres"])
    assert cfg.model.input_size == (513, 513)
    assert cfg.data.input_size == (513, 513)  # synced by apply_overrides
    assert cfg.model.remat is True
    assert cfg.model.compute_dtype == "bfloat16"
    assert dict(cfg.mesh.axes)["space"] == 3
    assert cfg.data.train_label_size is None
    # 513 rows split 3-way cleanly (the space-axis divisibility contract)
    assert 513 % 3 == 0
