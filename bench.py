"""Benchmark: EM-training throughput (images/sec/chip) on real hardware.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Protocol
--------
Measures the steady-state jitted EM train step — forward (bf16 MXU
compute) + on-device E-step + CE loss + backward + SGD-momentum update —
at the reference's production recipe: 321x321, 21 classes, E-step
(bg_p=0.4, fg_p=0.2, 5 iters), effective batch 30 (reference
deeplab.py:288-294, :181).

The reference realizes its effective batch as 6 x grad-accum 5
(sequential microbatching — its GPU could not hold batch 30,
deeplab.py:202-205). On TPU the same recipe runs FOLDED: one batch-30
step, accumulation 1 — the same update math (the CE loss is a pixel
mean, so the batch-30 mean equals the mean of five batch-6 means;
weight decay, momentum, and the epoch-indexed LR schedule are
per-update identical — pinned end-to-end by tests/test_trainer.py::
test_folded_batch_matches_accumulation, with the E-step's per-image
batch-independence pinned by test_estep_labels_batch_independent;
residual differences are RNG granularity the reference never pinned
plus conv reduction-order ulps. Two scoped caveats: [1] the E-step's
suppression inherits the reference's own global-batch-max lift
(reference estep.py:50) — the reference already couples each 6-image
microbatch through that max, and regrouping 30 images changes labels
only in degenerate regimes where the lift fails to dominate, which the
recipe's score maps never visit (the test pins the production regime);
[2] the equivalence is for the WEAK-supervision recipe — the
semi-supervised strong path normalizes its CE by each batch's valid
pixel count, so there fold != accum and the CLI warns) at batch-30 MFU
instead of batch-6
MFU: measured ~174 vs 115 img/s/chip (PROFILE.md batch-scaling
table). ``--micro`` reproduces the reference-granularity
batch-6 x accum-5 execution instead.

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


def main(micro: bool = False) -> None:
    import jax

    from em_adapt_tpu.config import ExperimentConfig, MeshConfig, ModelConfig
    from em_adapt_tpu.train import Trainer

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    n_dev = jax.device_count()
    K = 10  # steps fused per dispatch
    cfg = ExperimentConfig(
        model=ModelConfig(compute_dtype="bfloat16"),
        mesh=MeshConfig(axes=(("data", n_dev),)),
    )
    # Effective batch 30/chip (the reference's batch 6 x accum 5), scaled
    # by data parallelism. Folded by default: one batch-30 step, accum 1
    # (see module docstring); --micro runs the reference's granularity.
    # rng_impl="rbg": the TPU hardware RNG for dropout masks — threefry
    # mask generation alone cost ~32 ms/step at this shape (PROFILE.md).
    per_chip, accum = (6, 5) if micro else (30, 1)
    batch = per_chip * n_dev
    import dataclasses

    cfg = cfg.replace(
        optim=dataclasses.replace(cfg.optim, accum_steps=accum),
        train=dataclasses.replace(
            cfg.train, batch_size=batch, macro_steps=K, rng_impl="rbg"
        ),
    )

    # steps_per_epoch only indexes the LR schedule here: 10582 train
    # images / global batch (reference deeplab.py:241).
    trainer = Trainer(cfg, steps_per_epoch=max(10582 // batch, 1))
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
    shape = (
        "batch 6/chip x accum 5"
        if micro
        else "effective batch 30/chip = reference batch 6 x accum 5, folded"
    )
    print(
        json.dumps(
            {
                "metric": f"EM train-step throughput ({shape}; 321x321, "
                          "VGG16-LargeFOV + on-device E-step)",
                "value": round(ips_per_chip, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(ips_per_chip / CPU_TF_BASELINE_IMAGES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    import sys

    main(micro="--micro" in sys.argv[1:])
