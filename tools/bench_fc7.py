"""Probe fc7 (1x1 conv, 4096->4096 at 41^2) as conv vs explicit matmul.

fc7 runs at 103 TFLOP/s fwd+bwd (52% of v5e bf16 peak) through the 1x1
conv lowering (PROFILE.md) — low for what is a pure [10086, 4096] @
[4096, 4096] matmul. This measures whether reshaping to an explicit dot
is faster, fwd and fwd+grads (both are exactly the same math).

Usage: python tools/bench_fc7.py [--batch 6] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, C = args.batch, 41, 4096
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(B, H, H, C)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(g.normal(size=(1, 1, C, C)) * 0.01, jnp.bfloat16)
    dims = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dims)

    def matmul(x, w):
        y = jnp.dot(x.reshape(B * H * H, C), w.reshape(C, C),
                    preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(B, H, H, C)

    def p(t, acc):
        return t + (acc * 1e-20).astype(t.dtype)

    def gradboth(fn):
        def f(a):
            def loss(wx):
                w_, x_ = wx
                return jnp.sum(fn(x_, w_).astype(jnp.float32) ** 2)
            gw_, gx_ = jax.grad(loss)((w, p(x, a)))
            return (jnp.sum(gw_.astype(jnp.float32))
                    + jnp.sum(gx_.astype(jnp.float32)))
        return f

    cases = {
        "fwd_conv": lambda a: jnp.sum(conv(p(x, a), w).astype(jnp.float32)),
        "fwd_matmul": lambda a: jnp.sum(matmul(p(x, a), w).astype(jnp.float32)),
        "full_conv": gradboth(conv),
        "full_matmul": gradboth(matmul),
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

    fl = 2.0 * B * H * H * C * C
    for name, fn in cases.items():
        t = timed(fn)
        mult = 3.0 if name.startswith("full") else 1.0
        print(json.dumps({"case": name, "ms": round(t * 1e3, 3),
                          "tflops": round(fl * mult / t / 1e12, 1)}),
              flush=True)

    y0 = jax.jit(conv)(x, w).astype(jnp.float32)
    y1 = jax.jit(matmul)(x, w).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-30))
    print(json.dumps({"matmul_rel_err": err}), flush=True)


if __name__ == "__main__":
    main()
