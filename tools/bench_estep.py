"""E-step kernel benchmark: Pallas (batch-tiled) vs XLA-sort lowering.

Times the on-device E-step alone at the production score-map shape
(41x41x21) across batch sizes, including batch 24+ where round 1's
whole-batch-in-VMEM kernel used to fall back to the XLA path (the
batch-tiled kernel now covers it). Prints one JSON line per
(batch, impl).

Relay-safe timing: iterations chained in-graph via fori_loop with an
iteration-dependent input, scalar reduced, float()'d once. SLOPE
protocol (round 3): a single chain of N iterations still carries the
per-dispatch relay round trip (~30 ms on this rig) amortized over N —
at 41x41 that CONSTANT dominated the reported number (round 2's
"312 us/img at batch 6" was ~80% dispatch). Timing chains of N and 2N
and reporting (T(2N)-T(N))/N cancels the constant exactly, leaving pure
device compute per iteration.

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
    ap.add_argument("--iters", type=int, default=200,
                    help="slope baseline chain length; 2x is also timed "
                         "(large enough that per-iter compute, not relay "
                         "jitter, dominates the difference)")
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

            def time_chain(n, fn=fn):
                def loop(scores, label, orders):
                    def body(i, acc):
                        out = fn(scores + acc * 1e-20, label, orders)
                        return acc + jnp.sum(out)

                    return jax.lax.fori_loop(0, n, body, jnp.float32(0))

                jl = jax.jit(loop)
                float(jl(scores, label, orders))  # compile + warm
                t0 = time.perf_counter()
                float(jl(scores, label, orders))
                return time.perf_counter() - t0

            # slope: per-iteration device time, dispatch constant cancelled
            dt = (time_chain(2 * args.iters) - time_chain(args.iters)) / args.iters
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
