"""Isolate conv1_2's backward cost on TPU: grad-input vs grad-weight,
plus a 9-shifted-matmul grad-weight candidate (no materialized im2col).

conv1_2 = 3x3 SAME stride-1, 64->64, at 321^2 x batch 6 bf16 — measured
~8 ms fwd+bwd at ~17 TFLOP/s (bench_block1_parts.py), the single worst
op in the model. This tool answers which half of the backward to attack.

Usage: python tools/bench_conv2_grad.py [--batch 6] [--iters 30]
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
    x = jnp.asarray(g.normal(size=(B, H, H, C)), jnp.bfloat16)
    w = jnp.asarray(g.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    dims = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dims)

    # grad-weight via 9 shifted dots (XLA fuses pad+slice into each dot)
    def gw9(x, dy):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        outs = []
        for u in range(3):
            for v in range(3):
                xs = xp[:, u:u + H, v:v + H, :]
                outs.append(lax.dot_general(
                    xs.reshape(-1, C), dy.reshape(-1, C),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        return jnp.stack(outs).reshape(3, 3, C, C)

    cases = {}

    def loss_full(w, x):
        return jnp.sum(conv(x, w).astype(jnp.float32) ** 2)

    cases["fwd_only"] = lambda x, w: jnp.sum(conv(x, w).astype(jnp.float32))
    cases["grad_w_xla"] = lambda x, w: jnp.sum(
        jax.grad(loss_full)(w, x).astype(jnp.float32))
    cases["grad_x_xla"] = lambda x, w: jnp.sum(
        jax.grad(loss_full, argnums=1)(w, x).astype(jnp.float32))
    cases["grad_both_xla"] = lambda x, w: sum(
        jnp.sum(t.astype(jnp.float32))
        for t in jax.grad(loss_full, argnums=(0, 1))(w, x))

    def grad_w_9(x, w):
        y = conv(x, w)
        dy = (2.0 * y.astype(jnp.float32)).astype(x.dtype)
        return jnp.sum(gw9(x, dy))

    cases["fwd_plus_gw9"] = grad_w_9

    def timed(fn):
        def loop(x, w):
            def body(i, acc):
                return acc + fn(x + (acc * 1e-20).astype(x.dtype), w)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        jl = jax.jit(loop)
        float(jl(x, w))
        t0 = time.perf_counter()
        float(jl(x, w))
        return (time.perf_counter() - t0) / args.iters

    for name, fn in cases.items():
        t = timed(fn)
        print(json.dumps({"case": name, "ms": round(t * 1e3, 3)}), flush=True)

    # parity: gw9 vs XLA grad-weight
    dw0 = jax.jit(jax.grad(loss_full))(w, x).astype(jnp.float32)
    y = conv(x, w)
    dy = (2.0 * y.astype(jnp.float32)).astype(x.dtype)
    dw1 = jax.jit(gw9)(x, dy)
    err = float(jnp.max(jnp.abs(dw0 - dw1)) / (jnp.max(jnp.abs(dw0)) + 1e-30))
    print(json.dumps({"gw9_rel_err": err}), flush=True)


if __name__ == "__main__":
    main()
