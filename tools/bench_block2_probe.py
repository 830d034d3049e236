"""Probe: does the block1 fused-kernel design transfer to block2?

Block2 (reference deeplab.py:51-84 block pattern at 161^2, 64->128->128)
is structurally identical to block1 (conv-relu-conv-relu-ceil-SAME/s2
max pool), and ops/block1_pallas.py::block1_fused is channel-generic, so
its FORWARD runs on block2's shape as-is. The backward does NOT transfer
(it returns dx=0 under the first-layer contract; block2 needs dx), so a
block2 kernel would require a new dx-capable backward — this probe
measures whether that effort could possibly pay: if the fused forward
cannot at least match XLA's block2 forward, the VMEM-residency advantage
that powered block1 (8.6 TFLOP/s XLA baseline) is absent at block2's
MXU-friendly shape (79 TFLOP/s XLA forward, PROFILE.md) and the kernel
idea is dead on arrival.

Timing: relay-safe slope protocol (chains of N and 2N fori_loop iters,
one scalar fetch each; the per-dispatch relay constant ~30 ms cancels in
the difference — at N=20 it is ~1.5 ms/iter, the same order as block2's
~1 ms forward, so a single-chain average would skew the ratio toward 1).
"""

from __future__ import annotations

import json
import time

import numpy as np


def _chain_total(fn, args, iters, warmup=2, repeats=3):
    """Median total wall time of ONE dispatch running `iters` chained
    applications of fn (data-dependent chain defeats DCE/hoisting)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*args):
        def body(i, acc):
            x0 = (args[0] + acc.astype(args[0].dtype) * 1e-20)
            out = fn(x0, *args[1:])
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    for _ in range(warmup):
        float(run(*args))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def _time_chain(fn, args, iters=20):
    """Per-iteration time via the slope between chains of N and 2N."""
    t_n = _chain_total(fn, args, iters)
    t_2n = _chain_total(fn, args, 2 * iters)
    return (t_2n - t_n) / iters


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")

    from em_adapt_tpu.ops.block1_pallas import block1_fused
    from em_adapt_tpu.ops.conv import conv2d_same
    from em_adapt_tpu.ops.pooling import max_pool_same

    g = np.random.default_rng(0)
    b, h, cin, f = 6, 161, 64, 128
    dtype = jnp.bfloat16
    x = jnp.asarray(g.normal(size=(b, h, h, cin)), dtype)
    w1 = jnp.asarray(g.normal(size=(3, 3, cin, f)) * 0.05, dtype)
    b1 = jnp.asarray(g.normal(size=(f,)), jnp.float32)
    w2 = jnp.asarray(g.normal(size=(3, 3, f, f)) * 0.05, dtype)
    b2 = jnp.asarray(g.normal(size=(f,)), jnp.float32)

    def xla_block(x, w1, b1, w2, b2):
        y = jax.nn.relu(conv2d_same(x, w1) + b1.astype(x.dtype))
        y = jax.nn.relu(conv2d_same(y, w2) + b2.astype(x.dtype))
        return max_pool_same(y, window=3, stride=2)

    t_xla = _time_chain(xla_block, (x, w1, b1, w2, b2))
    t_pal = _time_chain(
        lambda *a: block1_fused(*a), (x, w1, b1, w2, b2)
    )
    print(json.dumps({
        "shape": f"{b}x{h}x{h}x{cin}->{f}",
        "xla_fwd_ms": round(t_xla * 1e3, 3),
        "pallas_fwd_ms": round(t_pal * 1e3, 3),
        "pallas_vs_xla": round(t_pal / t_xla, 2),
    }))


if __name__ == "__main__":
    main()
