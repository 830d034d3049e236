"""Feasibility probe: does XLA on this TPU lower s8xs8->s32 convolutions
to the int8 MXU path with a real speedup over bf16?

v5e lists ~394 int8 TOPS vs ~197 bf16 TFLOP/s, so a quantized serving
path (eval/quantize.py) could roughly double inference throughput for
the pure-conv model — IF the compiler actually hits the int8 systolic
path for `lax.conv_general_dilated` at our shapes. This probe measures
that directly, per representative layer shape, before any product code
is built on the assumption.

Protocol: slope timing (CLAUDE.md) — jit a fori_loop chain of N conv
applications reduced to one scalar, time N and 2N chains, report the
difference (cancels the per-dispatch relay constant). The carry is the
activation so XLA cannot collapse the chain.

Usage: python tools/bench_int8_probe.py [--iters 40]
"""

from __future__ import annotations

import argparse
import functools
import time


def _time_chain(fn, n_lo: int, n_hi: int, reps: int = 3) -> float:
    """Median slope seconds-per-iteration between chain lengths."""
    import jax

    lo = jax.jit(functools.partial(fn, n_lo))
    hi = jax.jit(functools.partial(fn, n_hi))
    float(lo())  # compile
    float(hi())
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(lo())
        t1 = time.perf_counter()
        float(hi())
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n_hi - n_lo))
    slopes.sort()
    return slopes[len(slopes) // 2]


def probe_shape(name: str, b: int, hw: int, cin: int, cout: int, k: int,
                iters: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    g = np.random.default_rng(0)
    x8 = jnp.asarray(g.integers(-127, 127, size=(b, hw, hw, cin)), jnp.int8)
    w8 = jnp.asarray(g.integers(-127, 127, size=(k, k, cin, cout)), jnp.int8)
    xb = jnp.asarray(g.normal(size=(b, hw, hw, cin)), jnp.bfloat16)
    wb = jnp.asarray(g.normal(size=(k, k, cin, cout)), jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x8.shape, w8.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    def chain_i8(n):
        def body(_, carry):
            y = lax.conv_general_dilated(
                carry, w8, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            )
            # requantize back to int8 (shift keeps values bounded —
            # the real path would scale per channel)
            return (y >> 12).astype(jnp.int8)[..., :cin]

        out = lax.fori_loop(0, n, body, x8)
        return jnp.sum(out.astype(jnp.int32))

    def chain_bf16(n):
        def body(_, carry):
            y = lax.conv_general_dilated(
                carry, wb, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            )
            return y.astype(jnp.bfloat16)[..., :cin]

        out = lax.fori_loop(0, n, body, xb)
        return jnp.sum(out.astype(jnp.float32))

    s_i8 = _time_chain(chain_i8, iters, 2 * iters)
    s_bf = _time_chain(chain_bf16, iters, 2 * iters)
    flops = 2 * b * hw * hw * k * k * cin * cout
    rec = {
        "shape": name,
        "int8_ms": round(s_i8 * 1e3, 3),
        "bf16_ms": round(s_bf * 1e3, 3),
        "speedup": round(s_bf / s_i8, 2),
        "int8_tops": round(flops / s_i8 / 1e12, 1),
        "bf16_tflops": round(flops / s_bf / 1e12, 1),
    }
    print(rec, flush=True)
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    print(f"platform={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", flush=True)
    # fc7-like (1x1, the big matmul), conv4-like (3x3x512), conv3-like
    probe_shape("fc7-like 41x41 4096->4096 1x1", 6, 41, 4096, 4096, 1,
                args.iters)
    probe_shape("conv4-like 41x41 512->512 3x3", 6, 41, 512, 512, 3,
                args.iters)
    probe_shape("conv3-like 81x81 256->256 3x3", 6, 81, 256, 256, 3,
                args.iters)


if __name__ == "__main__":
    main()
