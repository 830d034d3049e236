"""Probe fc6 (4x4x512->4096, atrous rate 4 at 41^2) formulations on TPU.

fc6 is 45% of the model's FLOPs and runs at 136 TFLOP/s fwd+bwd (~69%
of v5e bf16 peak) through XLA's conv lowering (PROFILE.md). This probes
whether an explicit im2col matmul — [B*41^2, 16*512] @ [8192, 4096],
near-perfect MXU shapes — beats it for the forward and/or grad-weight
(grad-input stays a conv either way; folding im2col patches back is a
16-term pad+add chain that costs more than it saves).

Usage: python tools/bench_fc6.py [--batch 6] [--iters 20]
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

    B, H, CIN, COUT, K, R = args.batch, 41, 512, 4096, 4, 4
    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(B, H, H, CIN)), jnp.bfloat16)
    w = jnp.asarray(g.normal(size=(K, K, CIN, COUT)) * 0.02, jnp.bfloat16)
    dims = ("NHWC", "HWIO", "NHWC")

    def conv(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        rhs_dilation=(R, R),
                                        dimension_numbers=dims)

    # SAME pad for effective extent 13 at 41: pad_total = 12 -> 6/6
    def patches(x):
        xp = jnp.pad(x, ((0, 0), (6, 6), (6, 6), (0, 0)))
        taps = [xp[:, u * R:u * R + H, v * R:v * R + H, :]
                for u in range(K) for v in range(K)]
        return jnp.concatenate(taps, axis=3).reshape(B * H * H, K * K * CIN)

    def fc6_matmul(x, w):
        y = jnp.dot(patches(x), w.reshape(K * K * CIN, COUT),
                    preferred_element_type=jnp.float32)
        return y.astype(x.dtype).reshape(B, H, H, COUT)

    def p(t, acc):
        return t + (acc * 1e-20).astype(t.dtype)

    def gradw(fn):
        def f(a):
            def loss(w_):
                return jnp.sum(fn(p(x, a), w_).astype(jnp.float32) ** 2)
            return jnp.sum(jax.grad(loss)(w).astype(jnp.float32))
        return f

    # mixed: matmul forward, conv-derived backward (grad-input as a
    # conv-transpose; folding im2col patches back would be a 16-term
    # pad+add chain over 165 MB)
    @jax.custom_vjp
    def fc6_mixed(x, w):
        return fc6_matmul(x, w)

    def _fwd(x, w):
        return fc6_mixed(x, w), (x, w)

    def _bwd(res, dy):
        x_, w_ = res
        _, vjp = jax.vjp(lambda xx, ww: conv(xx, ww), x_, w_)
        return vjp(dy)

    fc6_mixed.defvjp(_fwd, _bwd)

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
        "fwd_matmul": lambda a: jnp.sum(
            fc6_matmul(p(x, a), w).astype(jnp.float32)),
        "gradw_conv": gradw(conv),
        "gradw_matmul": gradw(fc6_matmul),
        "full_conv": gradboth(conv),
        "full_mixed": gradboth(fc6_mixed),
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

    flops_fwd = 2.0 * B * H * H * K * K * CIN * COUT
    for name, fn in cases.items():
        t = timed(fn)
        rec = {"case": name, "ms": round(t * 1e3, 3),
               "tflops_fwd_equiv": round(flops_fwd / t / 1e12, 1)}
        print(json.dumps(rec), flush=True)

    y0 = jax.jit(conv)(x, w).astype(jnp.float32)
    y1 = jax.jit(fc6_matmul)(x, w).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-30))
    print(json.dumps({"matmul_rel_err": err}), flush=True)


if __name__ == "__main__":
    main()
