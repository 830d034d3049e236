"""Measure the CPU TF reference-equivalent training-step throughput.

The reference publishes no throughput numbers (BASELINE.md), so the
"CPU TF reference" baseline for bench.py's vs_baseline is measured here:
a faithful TF2 re-statement of the reference's per-step work at the
production configuration (batch 6, 321x321, 21 classes — reference
deeplab.py:288-294):

  tf.data-style host batch -> VGG-16/LargeFOV forward (conv2d/atrous/pool,
  reference deeplab.py:51-107) -> host-side numpy E-step via
  tf.py_function (the reference's tf.py_func round trip,
  deeplab.py:120) -> softmax CE + wd*L2 -> gradients -> momentum update.

Run manually; the resulting images/sec goes into bench.py with provenance.

    python tools/measure_tf_baseline.py [steps]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main(steps: int = 3) -> float:
    import tensorflow as tf

    from em_adapt_tpu.models.deeplab import LAYER_SPECS, POOLS
    from em_adapt_tpu.ops.estep_oracle import estep_oracle

    tf.config.set_visible_devices([], "GPU")
    g = np.random.default_rng(0)

    weights = []
    specs = []
    for name, kh, kw, cin, cout, rate in LAYER_SPECS:
        w = tf.Variable(0.01 * g.normal(size=(kh, kw, cin, cout)).astype(np.float32))
        b = tf.Variable(np.zeros(cout, np.float32))
        weights += [w, b]
        specs.append((name, rate, w, b))

    opt = tf.keras.optimizers.SGD(learning_rate=1e-3, momentum=0.9)

    def forward(x, training):
        h = x
        for name, rate, w, b in specs:
            if rate > 1:
                h = tf.nn.atrous_conv2d(h, w, rate=rate, padding="SAME")
            else:
                h = tf.nn.conv2d(h, w, strides=1, padding="SAME")
            h = tf.nn.bias_add(h, b)
            if name != "fc8":
                h = tf.nn.relu(h)
            if name in ("fc6", "fc7") and training:
                h = tf.nn.dropout(h, rate=0.5)
            if name in POOLS:
                h = tf.nn.max_pool2d(h, 3, POOLS[name], "SAME")
        return h

    def estep_host(scores, label):
        return estep_oracle(
            scores.numpy(), label.numpy(), bg_p=0.4, fg_p=0.2, num_iter=5
        )

    @tf.function
    def step(img, label):
        with tf.GradientTape() as tape:
            logits = forward(img, training=True)
            shrunk = tf.squeeze(
                tf.compat.v1.image.resize_nearest_neighbor(label, tf.shape(logits)[1:3]),
                axis=3,
            )
            biased = tf.py_function(estep_host, [logits, shrunk], tf.float32)
            weak = tf.stop_gradient(tf.argmax(biased, axis=3))
            ce = tf.reduce_mean(
                tf.nn.sparse_softmax_cross_entropy_with_logits(
                    labels=tf.reshape(weak, [-1]),
                    logits=tf.reshape(logits, [-1, 21]),
                )
            )
            l2 = tf.add_n([tf.nn.l2_loss(w) for _, _, w, _ in specs])
            loss = ce + 1e-5 * l2
        grads = tape.gradient(loss, weights)
        opt.apply_gradients(zip(grads, weights))
        return loss

    img = tf.constant(g.normal(size=(6, 321, 321, 3)).astype(np.float32) * 40)
    label = tf.constant(g.integers(0, 21, size=(6, 321, 321, 1)).astype(np.float32))

    # Warmup/trace.
    loss = step(img, label)
    print("warmup loss:", float(loss))

    t0 = time.perf_counter()
    for _ in range(steps):
        loss = step(img, label)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / steps
    ips = 6 / dt
    print(f"CPU TF reference-equivalent: {dt*1000:.1f} ms/step, {ips:.3f} images/sec")
    return ips


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
