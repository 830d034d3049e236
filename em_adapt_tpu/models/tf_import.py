"""Import a reference TF1 ``tf.train.Saver`` checkpoint as a params pytree.

The reference's pretrained-model workflow ships ``tf.train.Saver``
checkpoints of TRAINABLE VARIABLES ONLY (reference network.py:100-102:
three Savers over ``trainable_list``; readme.md points users at
downloadable trained models). Variables are created by
``tf.get_variable`` at top scope — the surrounding ``tf.name_scope`` does
NOT affect variable names (reference deeplab.py:51-107, :152-167) — so
the checkpoint keys are flat ``<layer>_weights`` / ``<layer>_bias``
(``conv1_1_weights`` ... ``fc8_bias``) with kernels in the same HWIO
layout ``tf.nn.conv2d``/``atrous_conv2d`` consume and this framework
stores.

This module is the missing interop direction: ``eval/export.py``'s
``export_params_npy`` lets reference code warm-start from OUR weights;
``load_tf_checkpoint_params`` lets a reference-TRAINED model be
evaluated/served/fine-tuned here (``em-adapt import-tf``). TensorFlow is
imported lazily and used purely as a checkpoint reader.
"""

from __future__ import annotations

from typing import Any

import numpy as np

from em_adapt_tpu.config import ModelConfig
from em_adapt_tpu.models.deeplab import layer_specs


def load_tf_checkpoint_params(
    prefix: str, cfg: ModelConfig
) -> dict[str, dict[str, np.ndarray]]:
    """Read a reference TF1 checkpoint into ``{layer: {"w", "b"}}``.

    ``prefix`` is the Saver prefix (e.g. ``saver/norm-24000`` — the path
    WITHOUT the ``.index``/``.data-*`` suffixes, exactly what
    ``tf.train.Saver.restore`` takes at reference network.py:106).

    Every layer in ``layer_specs(cfg)`` must be present with the expected
    HWIO shape; a mismatch (e.g. a 21-class checkpoint imported under
    ``model.num_classes=4``) raises with both shapes in the message.
    """
    try:
        import tensorflow as tf  # heavy; reader-only use
    except ImportError as e:  # pragma: no cover - TF is in the dev image
        raise ImportError(
            "import-tf needs tensorflow on the host to read the "
            "checkpoint (used only as a reader)"
        ) from e

    reader = tf.train.load_checkpoint(prefix)
    shape_map = reader.get_variable_to_shape_map()

    params: dict[str, dict[str, np.ndarray]] = {}
    for name, kh, kw, cin, cout, _rate in layer_specs(cfg):
        got: dict[str, np.ndarray] = {}
        for suffix, want_shape in (
            ("weights", (kh, kw, cin, cout)),
            ("bias", (cout,)),
        ):
            var = f"{name}_{suffix}"
            if var not in shape_map:
                have = ", ".join(sorted(shape_map)) or "<empty>"
                raise KeyError(
                    f"variable {var!r} not found in checkpoint {prefix!r} "
                    f"(is it a reference em-adapt Saver checkpoint? "
                    f"available: {have})"
                )
            tensor = np.asarray(reader.get_tensor(var), np.float32)
            if tensor.shape != want_shape:
                raise ValueError(
                    f"{var}: checkpoint shape {tensor.shape} != expected "
                    f"{want_shape} (HWIO) — does the ModelConfig "
                    f"(num_classes={cfg.num_classes}, "
                    f"fc6_channels={cfg.fc6_channels}) match the "
                    f"checkpoint's training config?"
                )
            got["w" if suffix == "weights" else "b"] = tensor
        params[name] = got
    return params


def params_l2(params: dict[str, dict[str, Any]]) -> float:
    """Sum of squares over every leaf — the reference prints this before
    and after a restore as a loaded-weights fingerprint (reference
    deeplab.py:230-234); ``import-tf`` prints it for the same reason."""
    return float(
        sum(float(np.square(np.asarray(leaf)).sum())
            for layer in params.values() for leaf in layer.values())
    )
