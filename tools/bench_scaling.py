"""Throughput scaling across per-chip batch sizes (macro-fused, rbg RNG).

Prints one JSON line per batch size: images/sec/chip for the production
EM train step (fwd + on-device E-step + CE + bwd + accumulated update).
Results are recorded in PROFILE.md.

Usage: python tools/bench_scaling.py [--batches 6,12,24,48] [--remat]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="6,12,24,48")
    ap.add_argument("--remat", action="store_true",
                    help="rematerialize VGG blocks (cheaper activations)")
    ap.add_argument("--macro", type=int, default=10)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.config import ExperimentConfig, MeshConfig, ModelConfig
    from em_adapt_tpu.train import Trainer

    n_dev = jax.device_count()
    g = np.random.default_rng(0)
    for batch in [int(x) * n_dev for x in args.batches.split(",")]:
        cfg = ExperimentConfig(
            model=ModelConfig(compute_dtype="bfloat16", remat=args.remat),
            mesh=MeshConfig(axes=(("data", n_dev),)),
        )
        import dataclasses

        cfg = cfg.replace(train=dataclasses.replace(
            cfg.train, batch_size=batch, macro_steps=args.macro,
            rng_impl="rbg"))
        trainer = Trainer(cfg, steps_per_epoch=1763)
        state = trainer.init_state()
        host = {
            "image": (g.normal(size=(batch, 321, 321, 3)) * 40).astype(np.float32),
            "label": g.integers(0, 21, size=(batch, 321, 321, 1)).astype(np.float32),
        }
        sb = trainer.plan.shard_batch(host)
        mb = tuple([sb] * args.macro)
        # Trainer only builds macro_step for macro_steps > 1; --macro 1
        # measures the unfused single-dispatch path via train_step.
        if args.macro > 1:
            step = trainer.macro_step
        else:
            step = lambda s, mb_: trainer.train_step(s, mb_[0])  # noqa: E731
        state, m = step(state, mb)
        float(jax.device_get(m["loss"]))
        # Pipelined sync (same protocol as bench.py round 3): fetch the
        # PREVIOUS dispatch's scalar after enqueuing the next, median of
        # the inter-completion intervals — the relay round trip overlaps
        # compute instead of serializing between dispatches.
        n = 4
        times = []
        prev = None
        t_last = time.perf_counter()
        for _ in range(n):
            state, m = step(state, mb)
            if prev is not None:
                float(jax.device_get(prev["loss"]))
                now = time.perf_counter()
                times.append(now - t_last)
                t_last = now
            prev = m
        float(jax.device_get(prev["loss"]))
        times.append(time.perf_counter() - t_last)
        dt = sorted(times)[len(times) // 2] / args.macro
        print(json.dumps({
            "batch_per_chip": batch // n_dev,
            "remat": args.remat,
            "ms_per_step": round(dt * 1e3, 2),
            "images_per_sec_per_chip": round(batch / dt / n_dev, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
