"""Benchmark: EM-training throughput (images/sec/chip) on real hardware.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol
--------
Measures the steady-state jitted EM train step — forward (bf16 MXU
compute) + on-device E-step + CE loss + backward + accumulated
SGD-momentum update — at the reference's production configuration:
batch 6, 321x321, 21 classes, E-step (bg_p=0.4, fg_p=0.2, 5 iters),
gradient accumulation 5 (reference deeplab.py:288-294, :181).

``vs_baseline`` divides by the measured CPU TF reference-equivalent
throughput: 0.094 images/sec (63.6 s/step) — the same per-step work
(VGG-16/LargeFOV fwd+bwd with a host py_function E-step) restated in TF2
and timed on this machine's CPU via tools/measure_tf_baseline.py
(2026-08-16). The reference repo publishes no throughput numbers
(BASELINE.md), so this measured proxy is the baseline.

Timing notes: 10 microbatch steps are fused into ONE dispatch
(``make_macro_step`` — lax.scan over the step, exactly what
``train.macro_steps=10`` runs in production) with donated state; a scalar
metric is fetched once per macro dispatch. Device-to-host tensor
transfers are excluded, matching how a real training loop behaves (the
input batch is uploaded once here; the real pipeline overlaps H2D with
compute via the prefetcher + the compact uint8 wire format). Round 1
timed one dispatch + one scalar sync PER STEP, which on this rig's axon
relay (~30 ms round trip) under-reported the loop the product actually
runs by ~25%.
"""

from __future__ import annotations

import json
import time

import numpy as np

#: tools/measure_tf_baseline.py result on this machine (see module docstring).
CPU_TF_BASELINE_IMAGES_PER_SEC = 0.094


def main() -> None:
    import jax

    from em_adapt_tpu.config import ExperimentConfig, MeshConfig, ModelConfig
    from em_adapt_tpu.train import Trainer

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    n_dev = jax.device_count()
    K = 10  # microsteps fused per dispatch
    cfg = ExperimentConfig(
        model=ModelConfig(compute_dtype="bfloat16"),
        mesh=MeshConfig(axes=(("data", n_dev),)),
    )
    # Per-chip batch 6 (the reference's), scaled by data parallelism.
    # rng_impl="rbg": the TPU hardware RNG for dropout masks — threefry
    # mask generation alone cost ~32 ms/step at this shape (PROFILE.md).
    batch = 6 * n_dev
    cfg = cfg.replace(
        train=cfg.train.__class__(batch_size=batch, macro_steps=K, rng_impl="rbg")
    )

    trainer = Trainer(cfg, steps_per_epoch=1763)
    state = trainer.init_state()

    g = np.random.default_rng(0)
    host_batch = {
        "image": (g.normal(size=(batch, 321, 321, 3)) * 40).astype(np.float32),
        "label": g.integers(0, 21, size=(batch, 321, 321, 1)).astype(np.float32),
    }
    sb = trainer.plan.shard_batch(host_batch)
    macro_batch = tuple([sb] * K)

    # Warmup (compile + K steps).
    state, metrics = trainer.macro_step(state, macro_batch)
    float(jax.device_get(metrics["loss"]))

    # Pipelined timing, the production pattern (Trainer.fit's watchdog):
    # dispatch i+1 is enqueued BEFORE dispatch i's scalar is fetched, so
    # the relay round trip overlaps device compute instead of
    # serializing between dispatches (round 2 fetched after every
    # dispatch, charging ~one relay round trip per 10 steps to the
    # step time). Inter-completion intervals are per-dispatch durations
    # at queue depth 1; the median rejects relay jitter outliers.
    n = 6  # timed macro dispatches = 60 steps
    times = []
    prev = None
    t_last = time.perf_counter()
    for _ in range(n):
        state, metrics = trainer.macro_step(state, macro_batch)
        if prev is not None:
            float(jax.device_get(prev["loss"]))  # sync: prev dispatch done
            now = time.perf_counter()
            times.append(now - t_last)
            t_last = now
        prev = metrics
    float(jax.device_get(prev["loss"]))
    times.append(time.perf_counter() - t_last)
    dt = sorted(times)[len(times) // 2] / K

    ips_per_chip = batch / dt / n_dev
    print(
        json.dumps(
            {
                "metric": "EM train-step throughput (batch 6/chip, 321x321, VGG16-LargeFOV + on-device E-step)",
                "value": round(ips_per_chip, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips_per_chip / CPU_TF_BASELINE_IMAGES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
