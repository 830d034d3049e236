"""Probe jnp-level (pure XLA) reformulations of block1's two slow ops.

1. max-pool backward as a 9-offset equality GATHER (no SelectAndScatter):
     dy_in[r,j] = sum_{or,oc in {-1,0,1}} par(r-or) par(j-oc)
                  * (x[r,j] == rep2(pooled)[r-or, j-oc])
                  * rep2(dy)[r-or, j-oc]
   (rep2 = x2 nearest upsample; parity masks select valid window centers.
   Ties route gradient to EVERY max position instead of XLA's first-match.)

2. conv 3x3 SAME 64->64 as 9 flat matmuls: pad cols 321->328 with zeros,
   flatten (rows, cols) so tap (u,v) is ONE contiguous slice at offset
   (u-1)*328 + (v-1); cross-row wrap reads hit the zeroed pad columns.

Usage: python tools/bench_pool_conv_xla.py [--batch 6] [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--size", type=int, default=321)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from em_adapt_tpu.ops.pooling import max_pool_same

    B, H, C = args.batch, args.size, 64
    g = np.random.default_rng(0)
    xin = jnp.asarray(np.abs(g.normal(size=(B, H, H, C))), jnp.bfloat16)
    w = jnp.asarray(g.normal(size=(3, 3, C, C)) * 0.05, jnp.bfloat16)
    dims = ("NHWC", "HWIO", "NHWC")

    # ---------------- gather-based pool bwd ------------------------------
    def pool_bwd_gather(x, y, dy):
        """dy wrt x for 3x3 stride-2 SAME max pool (H odd)."""
        oh = y.shape[1]
        hh = x.shape[1]
        # nearest x2 upsample of pooled tensors onto the input grid:
        # rep[r] = t[r // 2], shape [2*oh] >= H+1
        def rep2(t):
            t = jnp.repeat(t, 2, axis=1)
            t = jnp.repeat(t, 2, axis=2)
            return t  # [B, 2*oh, 2*oh, C]

        # pad 1 so every shifted read is a static slice (no gathers)
        ry = jnp.pad(rep2(y), ((0, 0), (1, 0), (1, 0), (0, 0)))
        rdy = jnp.pad(rep2(dy), ((0, 0), (1, 0), (1, 0), (0, 0)))
        rr = jax.lax.broadcasted_iota(jnp.int32, (hh, 1, 1), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (hh, hh, 1), 1)
        out = jnp.zeros_like(x, dtype=dy.dtype)
        for orr in (-1, 0, 1):
            for occ in (-1, 0, 1):
                # window center exists where r-orr is even (and in range,
                # which the zero padding handles)
                par = ((rr - orr) % 2 == 0) & ((cc - occ) % 2 == 0)
                sl = (slice(None), slice(1 - orr, 1 - orr + hh),
                      slice(1 - occ, 1 - occ + hh), slice(None))
                hit = (x == ry[sl]) & par[None]
                out = out + jnp.where(hit, rdy[sl], 0)
        return out

    @jax.custom_vjp
    def pool_g(x):
        return max_pool_same(x, 3, 2)

    def pool_g_fwd(x):
        y = max_pool_same(x, 3, 2)
        return y, (x, y)

    def pool_g_bwd(res, dy):
        x, y = res
        return (pool_bwd_gather(x, y, dy),)

    pool_g.defvjp(pool_g_fwd, pool_g_bwd)

    # ---------------- flat 9-dot conv ------------------------------------
    WPAD = (H + 8) // 8 * 8  # cols padded (>=1 zero col; multiple of 8)

    def conv9(x, w):
        b = x.shape[0]
        # 2 pad rows each side keep every tap's slice start non-negative
        xp = jnp.pad(x, ((0, 0), (2, 2), (0, WPAD - H), (0, 0)))
        flat = xp.reshape(b, (H + 4) * WPAD, C)
        n = H * WPAD
        base = 2 * WPAD  # start of real row 0
        out = None
        for u in range(3):
            for v in range(3):
                off = base + (u - 1) * WPAD + (v - 1)
                sl = flat[:, off:off + n, :]
                t = jnp.einsum("bmc,cf->bmf", sl, w[u, v],
                               preferred_element_type=jnp.float32)
                out = t if out is None else out + t
        out = out.astype(x.dtype).reshape(b, H, WPAD, C)[:, :, :H, :]
        return out

    def conv_ref(x, w):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dims)

    # ---------------- timing ---------------------------------------------
    def timed(fn):
        # xin threads through as a jit ARGUMENT: baked in as a closure
        # constant it rides the remote-compile request body, which the
        # relay rejects over ~300 MB (HTTP 413) at batch 30.
        def loop(z, x_):
            def body(i, acc):
                return acc + fn(acc, x_)
            return jax.lax.fori_loop(0, args.iters, body, z)
        jl = jax.jit(loop)
        float(jl(jnp.float32(0), xin))
        t0 = time.perf_counter()
        float(jl(jnp.float32(0), xin))
        return (time.perf_counter() - t0) / args.iters

    def p(x, acc):
        return x + (acc * 1e-20).astype(x.dtype)

    def grad_pool(poolfn):
        def f(a, x_):
            def loss(x):
                return jnp.sum(poolfn(x).astype(jnp.float32) ** 2)
            return jnp.sum(jax.grad(loss)(p(x_, a)).astype(jnp.float32))
        return f

    def grad_conv(convfn):
        def f(a, x_):
            def loss(w_):
                return jnp.sum(convfn(p(x_, a), w_).astype(jnp.float32) ** 2)
            return jnp.sum(jax.grad(loss)(w).astype(jnp.float32))
        return f

    cases = {
        "poolbwd_xla": grad_pool(lambda t: max_pool_same(t, 3, 2)),
        "poolbwd_gather": grad_pool(pool_g),
        "conv_fwd_xla": lambda a, x_: jnp.sum(
            conv_ref(p(x_, a), w).astype(jnp.float32)),
        "conv_fwd_9dot": lambda a, x_: jnp.sum(
            conv9(p(x_, a), w).astype(jnp.float32)),
        "conv_gradw_xla": grad_conv(conv_ref),
        "conv_gradw_9dot": grad_conv(conv9),
    }
    for name, fn in cases.items():
        t = timed(fn)
        print(json.dumps({"case": name, "ms": round(t * 1e3, 3)}), flush=True)

    # parity
    y0 = jax.jit(conv_ref)(xin, w).astype(jnp.float32)
    y1 = jax.jit(conv9)(xin, w).astype(jnp.float32)
    cerr = float(jnp.max(jnp.abs(y0 - y1)) / (jnp.max(jnp.abs(y0)) + 1e-30))

    xr = jnp.asarray(g.normal(size=(2, 41, 41, 8)), jnp.float32)  # untied
    g0 = jax.grad(lambda t: jnp.sum(max_pool_same(t, 3, 2) ** 2))(xr)
    g1 = jax.grad(lambda t: jnp.sum(pool_g(t) ** 2))(xr)
    perr = float(jnp.max(jnp.abs(g0 - g1)))
    print(json.dumps({"conv9_rel_err": cerr, "poolbwd_maxabsdiff": perr}),
          flush=True)


if __name__ == "__main__":
    main()
