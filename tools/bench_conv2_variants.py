"""Probe XLA conv efficiency levers for the 321^2 x (64->64) shape:
channel padding to 128 lanes, batch-merged spatial, f32 accumulation dtype.

Usage: python tools/bench_conv2_variants.py [--batch 6] [--iters 30]
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
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, C = args.batch, 321, 64
    g = np.random.default_rng(0)
    x64 = jnp.asarray(g.normal(size=(B, H, H, C)), jnp.bfloat16)
    w64 = jnp.asarray(g.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    x128 = jnp.concatenate([x64, jnp.zeros_like(x64)], -1)
    w128 = jnp.asarray(g.normal(size=(3, 3, 128, 128)) * 0.05, jnp.bfloat16)
    xm = x64.reshape(1, B * H, H, C)
    dims = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dims)

    flops64 = 2 * B * H * H * 9 * C * C

    def p(x, acc):  # iteration-dependent input so XLA can't hoist the body
        return x + (acc * 1e-20).astype(x.dtype)

    cases = {
        "fwd_64_64": (lambda a: jnp.sum(
            conv(p(x64, a), w64).astype(jnp.float32)), 1.0),
        "fwd_128_128": (lambda a: jnp.sum(
            conv(p(x128, a), w128).astype(jnp.float32)), 4.0),
        "fwd_batchmerged": (lambda a: jnp.sum(
            conv(p(xm, a), w64).astype(jnp.float32)), 1.0),
        "gradw_64": (lambda a: jnp.sum(jax.grad(
            lambda w: jnp.sum(conv(p(x64, a), w).astype(jnp.float32) ** 2))(w64)
            .astype(jnp.float32)), None),
        "gradw_128": (lambda a: jnp.sum(jax.grad(
            lambda w: jnp.sum(conv(p(x128, a), w).astype(jnp.float32) ** 2))(w128)
            .astype(jnp.float32)), None),
    }

    def timed(fn):
        def loop(z):
            def body(i, acc):
                return acc + fn(acc)
            return jax.lax.fori_loop(0, args.iters, body, z)
        jl = jax.jit(loop)
        float(jl(jnp.float32(0)))
        t0 = time.perf_counter()
        float(jl(jnp.float32(0)))
        return (time.perf_counter() - t0) / args.iters

    for name, (fn, fl) in cases.items():
        t = timed(fn)
        rec = {"case": name, "ms": round(t * 1e3, 3)}
        if fl is not None:
            rec["tflops"] = round(flops64 * fl / t / 1e12, 1)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
