"""Importing reference TF1 tf.train.Saver checkpoints (em-adapt import-tf).

The fixture checkpoint is written IN the reference's exact on-disk shape:
``tf.compat.v1.train.Saver`` over variables created with the reference's
flat naming ``<layer>_weights`` / ``<layer>_bias`` (reference
deeplab.py:152-167 — ``tf.get_variable`` at top scope, name_scope does
not touch variable names) saved with a global step suffix like the
reference's ``saver/norm-<i>`` files (reference network.py:100,
deeplab.py:277-278). TensorFlow is required (it is the checkpoint
WRITER here and the reader inside the importer); the whole module skips
without it.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
tf = pytest.importorskip("tensorflow")

from em_adapt_tpu.config import (  # noqa: E402
    CheckpointConfig,
    EStepConfig,
    ExperimentConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from em_adapt_tpu.models.deeplab import layer_specs  # noqa: E402
from em_adapt_tpu.models.tf_import import (  # noqa: E402
    load_tf_checkpoint_params,
    params_l2,
)

TINY = ModelConfig(num_classes=4, input_size=(33, 33), fc6_channels=8)


def _write_reference_checkpoint(prefix, cfg: ModelConfig, seed=0, step=24000):
    """Write a TF1 Saver checkpoint with the reference's variable names
    and HWIO layout; returns ({layer: {w, b}}, saver_prefix)."""
    rng = np.random.default_rng(seed)
    tf1 = tf.compat.v1
    weights = {}
    with tf.Graph().as_default():
        trainable = []
        for name, kh, kw, cin, cout, _rate in layer_specs(cfg):
            w = rng.normal(size=(kh, kw, cin, cout)).astype(np.float32)
            b = rng.normal(size=(cout,)).astype(np.float32)
            weights[name] = {"w": w, "b": b}
            trainable.append(
                tf1.get_variable(
                    name=f"{name}_weights",
                    initializer=tf1.constant_initializer(w),
                    shape=w.shape,
                )
            )
            trainable.append(
                tf1.get_variable(
                    name=f"{name}_bias",
                    initializer=tf1.constant_initializer(b),
                    shape=b.shape,
                )
            )
        saver = tf1.train.Saver(var_list=trainable)
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            saved_prefix = saver.save(sess, str(prefix), global_step=step)
    return weights, saved_prefix


@pytest.fixture(scope="module")
def ref_ckpt(tmp_path_factory):
    root = tmp_path_factory.mktemp("tf_saver")
    return _write_reference_checkpoint(root / "norm", TINY)


def test_load_tf_checkpoint_params_roundtrips(ref_ckpt):
    weights, prefix = ref_ckpt
    params = load_tf_checkpoint_params(prefix, TINY)
    assert set(params) == set(weights)
    for name in weights:
        np.testing.assert_array_equal(params[name]["w"], weights[name]["w"])
        np.testing.assert_array_equal(params[name]["b"], weights[name]["b"])
    assert params_l2(params) == pytest.approx(
        sum(
            float((v["w"] ** 2).sum() + (v["b"] ** 2).sum())
            for v in weights.values()
        ),
        rel=1e-6,
    )


def test_load_tf_checkpoint_rejects_wrong_architecture(ref_ckpt):
    _, prefix = ref_ckpt
    with pytest.raises(ValueError, match="fc8_weights.*num_classes"):
        load_tf_checkpoint_params(
            prefix, ModelConfig(num_classes=7, input_size=(33, 33),
                                fc6_channels=8)
        )
    with pytest.raises(ValueError, match="fc6_weights.*fc6_channels"):
        load_tf_checkpoint_params(
            prefix, ModelConfig(num_classes=4, input_size=(33, 33),
                                fc6_channels=16)
        )


def test_load_tf_checkpoint_rejects_non_reference_checkpoint(tmp_path):
    """A checkpoint missing a reference variable (wrong repo / truncated
    var_list) raises KeyError naming the absentee."""
    tf1 = tf.compat.v1
    with tf.Graph().as_default():
        v = tf1.get_variable(
            name="conv1_1_weights",
            initializer=tf1.constant_initializer(0.0),
            shape=(3, 3, 3, 64),
        )
        saver = tf1.train.Saver(var_list=[v])
        with tf1.Session() as sess:
            sess.run(tf1.global_variables_initializer())
            prefix = saver.save(sess, str(tmp_path / "partial"))
    with pytest.raises(KeyError, match="conv1_1_bias"):
        load_tf_checkpoint_params(prefix, TINY)


def test_import_tf_cli_roundtrip(ref_ckpt, tmp_path):
    """em-adapt import-tf writes an orbax checkpoint whose params equal
    the TF variables, consumable by the warm-start machinery (so eval /
    predict / fine-tune all work on a reference-trained model)."""
    from em_adapt_tpu import cli
    from em_adapt_tpu.train import Trainer

    weights, prefix = ref_ckpt
    out = tmp_path / "imported"
    rc = cli.main([
        "import-tf", prefix, "--out", str(out), "--config",
        "model.num_classes=4", "model.input_size=(33,33)",
        "model.fc6_channels=8",
    ])
    assert rc == 0

    cfg = ExperimentConfig(
        model=TINY,
        estep=EStepConfig(num_iter=1),
        optim=OptimConfig(accum_steps=2),
        train=TrainConfig(batch_size=2, seed=7),
        checkpoint=CheckpointConfig(
            save_dir=str(tmp_path / "unused"), async_save=False
        ),
    )
    trainer = Trainer(cfg, steps_per_epoch=2)
    fresh = trainer.init_state()
    state = trainer.warm_start(fresh, str(out))
    for name in weights:
        np.testing.assert_array_equal(
            np.asarray(state.params[name]["w"]), weights[name]["w"]
        )
        np.testing.assert_array_equal(
            np.asarray(state.params[name]["b"]), weights[name]["b"]
        )
    # warm-start contract: fresh optimizer/step (reference model_path
    # semantics — the import is a fine-tune SOURCE, not a resume point).
    assert int(jax.device_get(state.step)) == 0
