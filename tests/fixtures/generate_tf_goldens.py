"""Generate TF1-semantics golden fixtures for the op layer.

Run manually (outputs are committed):

    python tests/fixtures/generate_tf_goldens.py

Uses tf.compat.v1 ops — bit-identical to the TF1 kernels the reference
calls: resize_bilinear / resize_nearest_neighbor with align_corners=False
and no half-pixel centers (reference network.py:40, deeplab.py:110,
dataset.py:156-172), 3x3 SAME max-pool (reference deeplab.py:77, :82), SAME
conv2d and atrous_conv2d (reference deeplab.py:58, :65, :92).
"""

from __future__ import annotations

import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    import tensorflow as tf

    v1 = tf.compat.v1
    g = np.random.default_rng(7)
    out = {}

    # --- resizes -----------------------------------------------------------
    for name, (ih, iw), (oh, ow) in [
        ("down_label", (321, 321), (41, 41)),   # E-step label shrink (deeplab.py:110)
        ("up_pred", (41, 41), (321, 321)),      # prediction upsample (network.py:40)
        ("odd", (13, 9), (7, 5)),
        ("upscale", (10, 10), (23, 17)),
    ]:
        img = g.normal(size=(2, ih, iw, 3)).astype(np.float32)
        lab = g.integers(0, 21, size=(2, ih, iw, 1)).astype(np.float32)
        lab[lab > 18] = 255.0
        bi = v1.image.resize_bilinear(img, (oh, ow), align_corners=False)
        nn = v1.image.resize_nearest_neighbor(lab, (oh, ow), align_corners=False)
        out[f"resize_{name}_img"] = img
        out[f"resize_{name}_lab"] = lab
        out[f"resize_{name}_bi"] = bi.numpy()
        out[f"resize_{name}_nn"] = nn.numpy()

    # --- max pool (ceil-mode SAME) ------------------------------------------
    for name, size, stride in [
        ("s2_321", 321, 2),
        ("s2_161", 161, 2),
        ("s2_81", 81, 2),
        ("s1_41", 41, 1),
        ("s2_10", 10, 2),
    ]:
        x = g.normal(size=(1, size, size, 4)).astype(np.float32)
        y = tf.nn.max_pool2d(x, ksize=3, strides=stride, padding="SAME")
        out[f"pool_{name}_x"] = x
        out[f"pool_{name}_y"] = y.numpy()

    # --- convs ---------------------------------------------------------------
    x = g.normal(size=(1, 21, 21, 5)).astype(np.float32)
    w3 = g.normal(size=(3, 3, 5, 7)).astype(np.float32)
    w4 = g.normal(size=(4, 4, 5, 7)).astype(np.float32)
    out["conv_x"] = x
    out["conv_w3"] = w3
    out["conv_w4"] = w4
    out["conv_same"] = tf.nn.conv2d(x, w3, strides=1, padding="SAME").numpy()
    out["conv_atrous2"] = tf.nn.atrous_conv2d(x, w3, rate=2, padding="SAME").numpy()
    out["conv_atrous4_k4"] = tf.nn.atrous_conv2d(x, w4, rate=4, padding="SAME").numpy()

    path = os.path.join(HERE, "tf_ops.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
