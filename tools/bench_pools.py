"""Measure XLA max-pool fwd+bwd cost at every pool shape in the model.

pool1 (321^2 x 64, stride 2) was absorbed into the fused block1 kernel;
this checks whether pool2-pool5's SelectAndScatter backwards are worth
the same treatment.

Usage: python tools/bench_pools.py [--batch 6] [--iters 30]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from em_adapt_tpu.ops.pooling import max_pool_same

    shapes = {
        "pool2_161x128_s2": (161, 128, 2),
        "pool3_81x256_s2": (81, 256, 2),
        "pool4_41x512_s1": (41, 512, 1),
        "pool5_41x512_s1": (41, 512, 1),
    }
    g = np.random.default_rng(0)

    def timed(fn, x):
        def loop(z):
            def body(i, acc):
                return acc + fn(x + (acc * 1e-20).astype(x.dtype))
            return jax.lax.fori_loop(0, args.iters, body, z)
        jl = jax.jit(loop)
        float(jl(jnp.float32(0)))
        t0 = time.perf_counter()
        float(jl(jnp.float32(0)))
        return (time.perf_counter() - t0) / args.iters

    for name, (h, c, stride) in shapes.items():
        x = jnp.asarray(np.abs(g.normal(size=(args.batch, h, h, c))),
                        jnp.bfloat16)

        def fwd(t, s=stride):
            return jnp.sum(max_pool_same(t, 3, s).astype(jnp.float32))

        def bwd(t, s=stride):
            gr = jax.grad(
                lambda u: jnp.sum(max_pool_same(u, 3, s).astype(jnp.float32) ** 2)
            )(t)
            return jnp.sum(gr.astype(jnp.float32))

        tf_ = timed(fwd, x)
        tb = timed(bwd, x)
        print(json.dumps({"pool": name, "fwd_ms": round(tf_ * 1e3, 3),
                          "fwdbwd_ms": round(tb * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
