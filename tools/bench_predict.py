"""Serving-path throughput: jitted predict (logits -> TF1-exact bilinear
upsample to input resolution -> argmax) on the production model.

Prints one JSON line per batch size. Relay-safe SLOPE timing (round 3,
same as tools/bench_estep.py): chains of N and 2N in-graph iterations,
the difference per iteration cancels the constant per-dispatch relay
round trip (~30 ms on this rig — ~9% of a batch-6 dispatch).

Usage: python tools/bench_predict.py [--batches 6,24] [--iters 20]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.config import ModelConfig
    from em_adapt_tpu.models import DeepLabLargeFOV

    model = DeepLabLargeFOV(ModelConfig(compute_dtype="bfloat16"))
    params = model.init(jax.random.key(0))
    g = np.random.default_rng(0)

    for b in [int(x) for x in args.batches.split(",")]:
        x = jnp.asarray((g.normal(size=(b, 321, 321, 3)) * 40), jnp.float32)

        def loop(x, params, n):
            def body(i, acc):
                _, pred = model.predict(params, x + acc * 1e-20)
                return acc + jnp.sum(pred).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        def time_chain(n):
            jl = jax.jit(lambda x, params: loop(x, params, n))
            float(jl(x, params))  # compile + warm
            t0 = time.perf_counter()
            float(jl(x, params))
            return time.perf_counter() - t0

        dt = (time_chain(2 * args.iters) - time_chain(args.iters)) / args.iters
        print(json.dumps({
            "batch": b,
            "ms_per_batch": round(dt * 1e3, 2),
            "images_per_sec": round(b / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
