"""Generate model-level golden fixtures using TF ops.

Run manually (outputs committed):

    python tests/fixtures/generate_model_goldens.py

Builds the DeepLab-LargeFOV forward pass with the exact TF kernels the
reference uses — tf.nn.conv2d / tf.nn.atrous_conv2d / tf.nn.max_pool2d /
tf.nn.relu (reference deeplab.py:51-107) — on a REDUCED configuration
(fewer channels, smaller input) so the fixture stays small, with shared
random weights, and records the resulting logits. Also writes a synthetic
Caffe-style init.npy for testing the loader.
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))

# Reduced config: channel widths scaled down 8x, fc6 64-wide, 5 classes.
SPECS = [
    ("conv1_1", 3, 3, 3, 8, 1),
    ("conv1_2", 3, 3, 8, 8, 1),
    ("conv2_1", 3, 3, 8, 16, 1),
    ("conv2_2", 3, 3, 16, 16, 1),
    ("conv3_1", 3, 3, 16, 32, 1),
    ("conv3_2", 3, 3, 32, 32, 1),
    ("conv3_3", 3, 3, 32, 32, 1),
    ("conv4_1", 3, 3, 32, 64, 1),
    ("conv4_2", 3, 3, 64, 64, 1),
    ("conv4_3", 3, 3, 64, 64, 1),
    ("conv5_1", 3, 3, 64, 64, 2),
    ("conv5_2", 3, 3, 64, 64, 2),
    ("conv5_3", 3, 3, 64, 64, 2),
    ("fc6", 4, 4, 64, 48, 4),
    ("fc7", 1, 1, 48, 48, 1),
    ("fc8", 1, 1, 48, 5, 1),
]
POOLS = {"conv1_2": 2, "conv2_2": 2, "conv3_3": 2, "conv4_3": 1, "conv5_3": 1}


def forward_tf(x, weights):
    import tensorflow as tf

    h = tf.constant(x)
    for name, _, _, _, _, rate in SPECS:
        w = tf.constant(weights[name]["w"])
        b = tf.constant(weights[name]["b"])
        if rate > 1:
            h = tf.nn.atrous_conv2d(h, w, rate=rate, padding="SAME")
        else:
            h = tf.nn.conv2d(h, w, strides=1, padding="SAME")
        h = tf.nn.bias_add(h, b)
        if name != "fc8":
            h = tf.nn.relu(h)
        if name in POOLS:
            h = tf.nn.max_pool2d(h, ksize=3, strides=POOLS[name], padding="SAME")
    return h.numpy()


def main():
    g = np.random.default_rng(3)
    weights = {}
    flat = {}
    for name, kh, kw, cin, cout, _ in SPECS:
        # Small magnitudes keep activations in range through 16 layers.
        w = (g.normal(size=(kh, kw, cin, cout)) * (1.5 / np.sqrt(kh * kw * cin))).astype(np.float32)
        b = (0.05 * g.normal(size=(cout,))).astype(np.float32)
        weights[name] = {"w": w, "b": b}
        flat[f"{name}_w"] = w
        flat[f"{name}_b"] = b

    x = g.normal(size=(2, 65, 65, 3)).astype(np.float32) * 40.0  # mean-sub scale
    logits = forward_tf(x, weights)
    print("logits shape", logits.shape)

    np.savez_compressed(os.path.join(HERE, "model_small.npz"), x=x, logits=logits, **flat)

    # Synthetic Caffe-style init.npy (all layers incl. fc8 slots, as the
    # converted VGG file has; fc8 entries are ignored by the loader policy).
    init = {name: {"w": weights[name]["w"], "b": weights[name]["b"]} for name, *_ in [
        (s[0],) for s in SPECS
    ]}
    np.save(os.path.join(HERE, "init_small.npy"), np.array(init, dtype=object))
    print("wrote model_small.npz + init_small.npy")


if __name__ == "__main__":
    main()
