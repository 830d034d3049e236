"""E-step kernel benchmark: Pallas (batch-tiled) vs XLA-sort lowering.

Times the on-device E-step alone at the production score-map shape
(41x41x21) across batch sizes, including batch 24+ where round 1's
whole-batch-in-VMEM kernel used to fall back to the XLA path (the
batch-tiled kernel now covers it). Prints one JSON line per
(batch, impl).

Relay-safe timing: iterations chained in-graph via fori_loop with an
iteration-dependent input, scalar reduced, float()'d once.

Usage: python tools/bench_estep.py [--batches 6,24,96] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="6,24,96")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.ops.estep import estep, make_class_orders
    from em_adapt_tpu.ops.estep_pallas import batch_tile, estep_pallas

    h = w = 41
    c = 21
    g = np.random.default_rng(0)
    orders = make_class_orders(jax.random.key(0), 5, c)

    for b in [int(x) for x in args.batches.split(",")]:
        scores = jnp.asarray(g.normal(size=(b, h, w, c)).astype(np.float32))
        label = jnp.asarray(
            np.where(
                g.uniform(size=(b, h, w)) < 0.1,
                255,
                g.integers(0, c, size=(b, h, w)),
            ).astype(np.float32)
        )
        for name, fn in (("pallas", estep_pallas), ("xla_sort", estep)):

            def loop(scores, label, orders, fn=fn):
                def body(i, acc):
                    out = fn(scores + acc * 1e-20, label, orders)
                    return acc + jnp.sum(out)

                return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))

            jl = jax.jit(loop)
            float(jl(scores, label, orders))  # compile + warm
            t0 = time.perf_counter()
            float(jl(scores, label, orders))
            dt = (time.perf_counter() - t0) / args.iters
            print(
                json.dumps(
                    {
                        "impl": name,
                        "batch": b,
                        "tile": batch_tile(b, h * w, c) if name == "pallas" else None,
                        "us_per_image": round(dt / b * 1e6, 1),
                        "ms_per_call": round(dt * 1e3, 3),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
