"""Serving-path throughput: jitted predict (logits -> TF1-exact bilinear
upsample to input resolution -> argmax) on the production model.

Prints one JSON line per batch size. Relay-safe SLOPE timing (round 3,
same as tools/bench_estep.py): chains of N and 2N in-graph iterations,
the difference per iteration cancels the constant per-dispatch relay
round trip (~30 ms on this rig — ~9% of a batch-6 dispatch).

--int8 additionally measures the post-training-quantized serving path
(eval/quantize.py: s8xs8->s32 MXU convs) on the same shapes, reporting
its throughput and the speedup over the bf16 path.

Usage: python tools/bench_predict.py [--batches 6,24] [--iters 20] [--int8]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="6,24")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--int8", action="store_true",
                    help="also measure the int8 PTQ serving path")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.config import ModelConfig
    from em_adapt_tpu.models import DeepLabLargeFOV

    cfg = ModelConfig(compute_dtype="bfloat16")
    model = DeepLabLargeFOV(cfg)
    params = model.init(jax.random.key(0))
    g = np.random.default_rng(0)

    variants = [("bf16", model, params)]
    if args.int8:
        from em_adapt_tpu.eval.quantize import quantize_model

        calib = jnp.asarray(
            (g.normal(size=(6, 321, 321, 3)) * 40), jnp.float32
        )
        qmodel, qparams = quantize_model(cfg, params, [calib])
        variants.append(("int8", qmodel, qparams))

    for b in [int(x) for x in args.batches.split(",")]:
        x = jnp.asarray((g.normal(size=(b, 321, 321, 3)) * 40), jnp.float32)
        row: dict = {"batch": b}

        for tag, m, p in variants:
            def loop(x, params, n, m=m):
                def body(i, acc):
                    _, pred = m.predict(params, x + acc * 1e-20)
                    return acc + jnp.sum(pred).astype(jnp.float32)

                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            def time_chain(n):
                jl = jax.jit(lambda x, params: loop(x, params, n))
                float(jl(x, p))  # compile + warm
                t0 = time.perf_counter()
                float(jl(x, p))
                return time.perf_counter() - t0

            dt = (time_chain(2 * args.iters) - time_chain(args.iters)) / args.iters
            row[f"{tag}_ms_per_batch"] = round(dt * 1e3, 2)
            row[f"{tag}_images_per_sec"] = round(b / dt, 1)
        if args.int8:
            row["int8_speedup"] = round(
                row["int8_images_per_sec"] / row["bf16_images_per_sec"], 3
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
