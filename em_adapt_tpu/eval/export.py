"""Serialized inference artifacts (jax.export / StableHLO).

The reference registers graph collections so a reloaded TF metagraph can
be driven without the model-building code (reference network.py:97-98,
deeplab.py:221). The TPU-native equivalent is ``jax.export``: the jitted
predict function (preprocessed image -> upsampled probabilities + hard
labels) is serialized as a versioned StableHLO artifact that any JAX
process can load and call WITHOUT this package's model code — the serving
hand-off format.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import export as jax_export

from em_adapt_tpu.config import ExperimentConfig


def export_predict_fn(cfg: ExperimentConfig, model, params, batch_size: int | None = None) -> bytes:
    """Serialize predict(images) -> (probs, labels) with params baked in.

    images: [B, H, W, 3] float32, already preprocessed (BGR, mean-sub).
    Returns the serialized artifact bytes (write to a .stablehlo file).
    """
    h, w = cfg.model.input_size
    b = batch_size or cfg.eval.batch_size
    frozen = jax.device_get(params)  # bake weights as constants

    def predict(images):
        up, pred = model.predict(frozen, images)
        return jax.nn.softmax(up, axis=-1), pred

    spec = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32)
    exported = jax_export.export(jax.jit(predict))(spec)
    return bytes(exported.serialize())


def load_predict_fn(blob: bytes):
    """Rehydrate a serialized artifact into a callable(images)."""
    exported = jax_export.deserialize(blob)
    return lambda images: exported.call(images)


def export_params_npy(params, path: str) -> None:
    """Write params in the reference's ``init.npy`` interchange format.

    The reference warm-starts from ``np.load(path, encoding="latin1")
    .item()`` -> ``{layer: {"w": HWIO float32, "b": [C] float32}}``
    (reference deeplab.py:126-129, :160-167). Our param tree already uses
    those layer names and the HWIO layout, so a trained checkpoint can be
    handed BACK to the reference (or to any Caffe-init consumer) as its
    ``init.npy`` / ``model_path`` input — the reverse of
    ``ModelConfig.init_model_path``. The FILE holds every layer exactly
    (fc8 included, bit-for-bit through ``load_caffe_init``); note however
    that the init.npy CONSUMERS re-initialize fc8 by contract (reference
    deeplab.py:156-167, mirrored in ``init_params``) — the trained
    classifier head survives in the file but a warm start from it gets a
    fresh Xavier fc8, exactly as the reference's own init.npy workflow
    does (tests/test_export.py pins both facts).
    """
    import numpy as np

    blob = {
        layer: {k: np.asarray(v, dtype=np.float32) for k, v in leaves.items()}
        for layer, leaves in jax.device_get(params).items()
    }
    # Write through a file object: np.save(str_path) appends ".npy" to
    # unsuffixed paths, which would break the CLI's size report.
    with open(path, "wb") as f:
        np.save(f, np.asarray(blob, dtype=object), allow_pickle=True)
