"""Component-level timing of block1's backward on TPU.

bench_block1.py showed the im2col conv1_1 grad-weight buys nothing —
the ~11 ms block1 backward lives elsewhere. Prefix-difference over the
exact op chain (conv1_1, relu, conv1_2, relu, pool1) isolates it, plus
a maximum-chain pool candidate (measured 4x WORSE than SelectAndScatter
on TPU — kept as the recorded negative result).

Usage: python tools/bench_block1_parts.py [--batch 6] [--iters 30]
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

    from em_adapt_tpu.ops.conv import conv2d_same
    from em_adapt_tpu.ops.pooling import max_pool_same

    B, H = args.batch, 321
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(B, H, H, 3)) * 40, jnp.float32)
    params = {
        "conv1_1": {
            "w": jnp.asarray(g.normal(size=(3, 3, 3, 64)) * 0.1, jnp.float32),
            "b": jnp.zeros((64,), jnp.float32),
        },
        "conv1_2": {
            "w": jnp.asarray(g.normal(size=(3, 3, 64, 64)) * 0.05, jnp.float32),
            "b": jnp.zeros((64,), jnp.float32),
        },
    }
    bf16 = jnp.bfloat16

    def conv1(p, h):
        return jax.nn.relu(
            conv2d_same(h, p["conv1_1"]["w"], p["conv1_1"]["b"], compute_dtype=bf16))

    def conv2(p, h):
        return jax.nn.relu(
            conv2d_same(h, p["conv1_2"]["w"], p["conv1_2"]["b"], compute_dtype=bf16))

    # ---- maximum-chain pool: elementwise 3-way max per axis + strided
    # slice. Same SAME geometry for odd windows (symmetric pad); backward
    # is selects + pad-dilate instead of SelectAndScatter.
    def max_pool_chain(x, window, stride):
        assert window == 3
        neg = jnp.asarray(-jnp.inf, x.dtype)
        m = x
        for axis in (1, 2):
            lo = jnp.pad(x, [(0, 0)] * axis + [(1, 0)] + [(0, 0)] * (3 - axis),
                         constant_values=neg)
            hi = jnp.pad(x, [(0, 0)] * axis + [(0, 1)] + [(0, 0)] * (3 - axis),
                         constant_values=neg)
            sl = [slice(None)] * 4
            sl[axis] = slice(0, x.shape[axis])
            m = jnp.maximum(m, lo[tuple(sl)])
            sl[axis] = slice(1, x.shape[axis] + 1)
            m = jnp.maximum(m, hi[tuple(sl)])
            x = m
        if stride > 1:
            m = m[:, ::stride, ::stride, :]
        return m

    chains = {
        "conv1_relu": lambda p, x: conv1(p, x.astype(bf16)),
        "conv1_conv2": lambda p, x: conv2(p, conv1(p, x.astype(bf16))),
        "full_pool_xla": lambda p, x: max_pool_same(
            conv2(p, conv1(p, x.astype(bf16))), 3, 2),
        "full_pool_chain": lambda p, x: max_pool_chain(
            conv2(p, conv1(p, x.astype(bf16))), 3, 2),
        "pool_only_xla": lambda p, x: max_pool_same(
            jnp.tile(x.astype(bf16), (1, 1, 1, 22))[..., :64], 3, 2),
        "pool_only_chain": lambda p, x: max_pool_chain(
            jnp.tile(x.astype(bf16), (1, 1, 1, 22))[..., :64], 3, 2),
    }

    def timed_grad(fn, wrt_x=False):
        def loss(p, x):
            return jnp.sum(fn(p, x).astype(jnp.float32) ** 2)

        def grad_all(x, p):
            if wrt_x:
                gt = jax.grad(loss, argnums=1)(p, x)
                return jnp.sum(gt.astype(jnp.float32))
            gt = jax.grad(loss)(p, x)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(gt))

        def loop(x, p):
            def body(i, acc):
                return acc + grad_all(x + acc * 1e-20, p)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        jl = jax.jit(loop)
        float(jl(x, params))
        t0 = time.perf_counter()
        float(jl(x, params))
        return (time.perf_counter() - t0) / args.iters

    for name, fn in chains.items():
        wrt_x = name.startswith("pool_only")
        tb = timed_grad(fn, wrt_x=wrt_x)
        print(json.dumps({"chain": name, "fwdbwd_ms": round(tb * 1e3, 3)}),
              flush=True)

    # parity of the maximum-chain pool (values + grads, untied data)
    xr = jnp.asarray(g.normal(size=(2, 41, 41, 8)), jnp.float32)

    def gx(poolfn):
        return jax.grad(lambda t: jnp.sum(poolfn(t, 3, 2) ** 2))(xr)

    d = float(jnp.max(jnp.abs(gx(lambda t, w, s: max_pool_same(t, w, s))
                              - gx(max_pool_chain))))
    dv = float(jnp.max(jnp.abs(max_pool_same(xr, 3, 2) - max_pool_chain(xr, 3, 2))))
    print(json.dumps({"poolgrad_maxabsdiff_untied": d,
                      "poolval_maxabsdiff": dv}), flush=True)


if __name__ == "__main__":
    main()
