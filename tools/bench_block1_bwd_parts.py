"""Cost decomposition of the fused block1 kernel's BACKWARD on TPU.

The backward (ops/block1_pallas.py::_bwd_kernel) spends its time in five
places: the conv1/conv2 recompute, the pool + first-match recompute, the
rep2 upsample + 9-shift routing, and the dw/db gradient dots. This probe
times TIMING-ONLY variants of the real kernel pieces (outputs are
numerically meaningless for the skip variants — gradients are never
used) to decide which stash/skip surgery pays:

  full        — the real backward composition (reference timing)
  skip_fm     — first-match replaced by a constant (cost of
                _pool_first_match)
  skip_pool   — _pool + first-match + rep2 + routing all skipped
                (dz2 taken from dy broadcast; cost of ALL pool machinery)
  skip_conv2  — conv2 dot skipped, y1p slice reused as y2r (cost of the
                conv2 recompute dot; staging for dw2 retained)
  grads_only  — conv1 + staging + grad dots only (the irreducible floor
                if everything else were stashed)

Usage: python tools/bench_block1_bwd_parts.py [--batch 6] [--iters 20]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from em_adapt_tpu.ops import block1_pallas as bp

    B, H = args.batch, 321
    f = 64
    c1 = 3
    oh = (H + 1) // 2
    pt = bp.pick_pt(oh)
    ns = oh // pt
    wpad = bp._wpad(H)
    m1 = (2 * pt + 5) * wpad
    m2 = (2 * pt + 3) * wpad

    g = np.random.default_rng(0)
    dtype = jnp.bfloat16
    x = jnp.asarray(g.normal(size=(B, H, H, c1)) * 10, jnp.float32).astype(dtype)
    w1 = jnp.asarray(g.normal(size=(3, 3, c1, f)) * 0.1, dtype)
    w2 = jnp.asarray(g.normal(size=(3, 3, f, f)) * 0.05, dtype)
    b1 = jnp.zeros((f,), jnp.float32)
    b2 = jnp.zeros((f,), jnp.float32)
    dy = jnp.asarray(g.normal(size=(B, oh, oh, f)), dtype)

    patches = bp._prep_patches(x, pt, ns, wpad)
    w1r = w1.reshape(9 * c1, f)
    w2r = w2.reshape(9 * f, f)
    b1r = b1.reshape(1, f)
    b2r = b2.reshape(1, f)
    w2t = jnp.transpose(w2, (0, 1, 3, 2)).reshape(9 * f, f)
    dyp = jnp.pad(dy, ((0, 0), (1, 0), (0, 0), (0, 0)))
    dys = jnp.stack(
        [jax.lax.slice_in_dim(dyp, pt * s, pt * s + pt + 1, axis=1)
         for s in range(ns)], axis=1)

    def make_kernel(mode):
        def kernel(patches_ref, dy_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                   w2t_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, im2col_ref):
            p2_ref = pz_ref = im2col_ref
            s = pl.program_id(1)
            b_idx = pl.program_id(0)
            R1, R2 = 2 * pt + 5, 2 * pt + 3
            M1, M2 = R1 * wpad, R2 * wpad

            @pl.when((b_idx == 0) & (s == 0))
            def _init():
                dw1_ref[:] = jnp.zeros_like(dw1_ref)
                db1_ref[:] = jnp.zeros_like(db1_ref)
                dw2_ref[:] = jnp.zeros_like(dw2_ref)
                db2_ref[:] = jnp.zeros_like(db2_ref)

            y1p = bp._conv1(patches_ref, w1_ref, b1_ref, s=s, PT=pt, H=H,
                            W=H, WPAD=wpad, dtype=dtype)
            if mode in ("skip_conv2", "grads_only"):
                # stage taps for dw2 (always needed) but skip conv2's dot
                for u in range(3):
                    for v in range(3):
                        off = (u + 1) * wpad + (v - 1)
                        t_ = (3 * u + v) * f
                        p2_ref[0:M2, t_:t_ + f] = jax.lax.slice_in_dim(
                            y1p, off, off + M2, axis=0)
                y2r = jax.lax.slice_in_dim(y1p, wpad, wpad + M2, axis=0)
            else:
                y2r = bp._conv2(y1p, w2_ref, b2_ref, p2_ref, s=s, PT=pt,
                                H=H, W=H, WPAD=wpad, dtype=dtype)

            adt = bp._acc_dtype(dtype)
            dy_slab = dy_ref[0, 0]

            if mode in ("skip_pool", "grads_only"):
                # skip ALL pool machinery: fake dz2 from y2r + a dy scalar
                dz2f = (y2r.astype(adt)
                        * jnp.sum(dy_slab.astype(jnp.float32)).astype(adt))
            elif mode == "skip_fm":
                # cost of _pool_first_match alone: same routing, but the
                # first-match map replaced by a constant
                orig = bp._pool_first_match
                bp._pool_first_match = lambda *a, **k: jnp.zeros(
                    (pt + 1, oh, f), jnp.float32)
                try:
                    pooled = bp._pool(y2r, PT=pt, WPAD=wpad, OW=oh)
                    dz2f = bp._pool_route_bwd(y2r, pooled, dy_slab, PT=pt,
                                              WPAD=wpad, OW=oh, dtype=dtype)
                finally:
                    bp._pool_first_match = orig
            else:  # full — the production composition, via the SHARED
                # helper so this probe cannot drift from the real kernel
                pooled = bp._pool(y2r, PT=pt, WPAD=wpad, OW=oh)
                dz2f = bp._pool_route_bwd(y2r, pooled, dy_slab, PT=pt,
                                          WPAD=wpad, OW=oh, dtype=dtype)

            dz2f = dz2f.reshape(M2, f)
            db2_ref[:] += jnp.sum(dz2f.astype(jnp.float32), axis=0,
                                  keepdims=True)
            dw2_ref[:] += jax.lax.dot_general(
                p2_ref[0:M2, :], dz2f.astype(dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sh = 3 * wpad + 1
            nz = M1 + 2 * wpad
            zpad = jnp.zeros((sh, f), dtype)
            dz2pad = jnp.concatenate([zpad, dz2f.astype(dtype), zpad], axis=0)
            for u in range(3):
                for v in range(3):
                    st = sh - ((u + 1) * wpad + (v - 1))
                    t_ = (3 * u + v) * f
                    pz_ref[:, t_:t_ + f] = jax.lax.slice_in_dim(
                        dz2pad, st, st + nz, axis=0)
            dy1p = jnp.dot(pz_ref[:], w2t_ref[:],
                           preferred_element_type=jnp.float32)
            y1r = jax.lax.slice_in_dim(y1p, wpad, wpad + M1, axis=0)
            dz1 = jnp.where(y1r.astype(jnp.float32) > 0,
                            jax.lax.slice_in_dim(dy1p, wpad, wpad + M1,
                                                 axis=0),
                            jnp.zeros((), jnp.float32))
            db1_ref[:] += jnp.sum(dz1.astype(jnp.float32), axis=0,
                                  keepdims=True)
            dw1_ref[:] += jax.lax.dot_general(
                patches_ref[0, 0], dz1.astype(dtype),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return kernel

    def build(mode):
        zeros2 = lambda r, c: jax.ShapeDtypeStruct((r, c), jnp.float32)
        call = pl.pallas_call(
            make_kernel(mode),
            grid=(B, ns),
            in_specs=bp._specs(B, ns, m1, 9 * c1, f, pt, oh, with_dy=True),
            out_specs=[
                pl.BlockSpec((9 * c1, f), lambda bi, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda bi, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((9 * f, f), lambda bi, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, f), lambda bi, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[zeros2(9 * c1, f), zeros2(1, f), zeros2(9 * f, f),
                       zeros2(1, f)],
            scratch_shapes=[
                pltpu.VMEM(((2 * pt + 5) * wpad + 2 * wpad, 9 * f), dtype),
            ],
            interpret=jax.default_backend() != "tpu",
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=bp._VMEM_LIMIT),
        )

        def run(p_, dys_):
            outs = call(p_, dys_, w1r, b1r, w2r, b2r, w2t)
            return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

        # in-graph loop (relay-safe timing, see CLAUDE.md); the acc
        # perturbation on dys keeps the pallas call loop-variant
        def loop(z, p_, dys_):
            def body(i, acc):
                return acc + run(p_, dys_ + (acc * 1e-20).astype(dys_.dtype))
            return jax.lax.fori_loop(0, args.iters, body, z)
        return jax.jit(loop)

    for mode in ("full", "skip_fm", "skip_pool", "skip_conv2", "grads_only"):
        fn = build(mode)
        float(fn(jnp.float32(0), patches, dys))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(jnp.float32(0), patches, dys))
            ts.append((time.perf_counter() - t0) / args.iters)
        print(json.dumps({"mode": mode, "ms": round(min(ts) * 1e3, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
