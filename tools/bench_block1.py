"""Micro-bench of block1 (conv1_1 + conv1_2 + pool1) formulations on TPU.

PROFILE.md round 2: block1 fwd+bwd is 16.7 ms of the 59 ms step at 8.6
TFLOP/s — the one conv laggard — and micro-probes blame conv1_1's
grad-weight lowering (cin=3 leaves 125 of 128 MXU/VPU lanes idle in
whatever layout XLA picks for the [3,3,3,64] reduction). Candidates:

  baseline    block1 exactly as models/deeplab.py builds it
  im2col_gw   conv1_1 under a custom_vjp whose grad-weight is an explicit
              im2col matmul: dW[27,64] = patches[B*H*W,27]^T @ dy[B*H*W,64]
              (identical math; grad-input is the standard transposed conv,
              DCE'd because nothing upstream of conv1_1 needs it)
  s2d         whole block in space-to-depth(2) domain (phase-split convs)

Timing protocol per CLAUDE.md: one jit, in-graph fori-loop, scalar out,
float() through the relay. Gradients are taken wrt PARAMS only and summed
over every leaf (single-leaf returns let XLA DCE sibling grad matmuls).

Usage: python tools/bench_block1.py [--batch 6] [--iters 30]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    # ---- candidate 1: baseline ------------------------------------------
    def block1_baseline(p, x):
        h = x.astype(bf16)
        h = conv2d_same(h, p["conv1_1"]["w"], p["conv1_1"]["b"], compute_dtype=bf16)
        h = jax.nn.relu(h)
        h = conv2d_same(h, p["conv1_2"]["w"], p["conv1_2"]["b"], compute_dtype=bf16)
        h = jax.nn.relu(h)
        return max_pool_same(h, 3, 2)

    # ---- candidate 2: custom grad-weight for conv1_1 --------------------
    @jax.custom_vjp
    def conv1_im2col_gw(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def _fwd(x, w):
        return conv1_im2col_gw(x, w), (x, w)

    def _bwd(res, dy):
        x, w = res
        kh, kw, cin, cout = w.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        hh, ww = x.shape[1], x.shape[2]
        cols = [xp[:, u:u + hh, v:v + ww, :] for u in range(kh) for v in range(kw)]
        patches = jnp.concatenate(cols, axis=-1)  # [B,H,W,kh*kw*cin]
        dw = jnp.einsum(
            "bijp,bijf->pf", patches, dy,
            preferred_element_type=jnp.float32,
        ).reshape(kh, kw, cin, cout).astype(w.dtype)
        # Standard transposed-conv grad-input; DCE'd when x needs no grad.
        dx = jax.lax.conv_general_dilated(
            dy, jnp.flip(w, (0, 1)).swapaxes(2, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return dx, dw

    conv1_im2col_gw.defvjp(_fwd, _bwd)

    def block1_im2col(p, x):
        h = x.astype(bf16)
        h = conv1_im2col_gw(h, p["conv1_1"]["w"].astype(bf16))
        h = h + p["conv1_1"]["b"].astype(bf16)
        h = jax.nn.relu(h)
        h = conv2d_same(h, p["conv1_2"]["w"], p["conv1_2"]["b"], compute_dtype=bf16)
        h = jax.nn.relu(h)
        return max_pool_same(h, 3, 2)

    # ---- candidate 3: both convs with im2col grad-weight ----------------
    def block1_im2col_both(p, x):
        h = x.astype(bf16)
        h = conv1_im2col_gw(h, p["conv1_1"]["w"].astype(bf16))
        h = h + p["conv1_1"]["b"].astype(bf16)
        h = jax.nn.relu(h)
        h = conv1_im2col_gw(h, p["conv1_2"]["w"].astype(bf16))
        h = h + p["conv1_2"]["b"].astype(bf16)
        h = jax.nn.relu(h)
        return max_pool_same(h, 3, 2)

    # ---- candidate 4: whole block in space-to-depth(2) domain ------------
    # conv1_2 at 321^2 x (64->64) runs at ~17 TFLOP/s fwd+bwd (half-empty
    # 128-lane MXU contraction/output) and pool1's backward lowers to
    # SelectAndScatter (~3.7 ms). In s2d-2 domain conv1_2 is a 3x3-block
    # 256->256 conv (4x FLOPs, full lanes) and pool1 is an elementwise max
    # over 9 phase-slices. Exact same math: kernels are scatter-placed
    # copies of the pixel-domain weights.
    def _placement(nk: int, off: int) -> np.ndarray:
        """P[s,t,p,q,a,b,u,v] = 1 where the s2d kernel tap (s,t,p,q)->(a,b)
        reads pixel-domain weight (u,v): u = 2s+p-a-off, v = 2t+q-b-off."""
        P = np.zeros((nk, nk, 2, 2, 2, 2, 3, 3), np.float32)
        for s in range(nk):
            for t in range(nk):
                for p in range(2):
                    for q in range(2):
                        for a in range(2):
                            for b in range(2):
                                u, v = 2 * s + p - a - off, 2 * t + q - b - off
                                if 0 <= u < 3 and 0 <= v < 3:
                                    P[s, t, p, q, a, b, u, v] = 1.0
        return P

    P1 = jnp.asarray(_placement(2, 0))
    P2 = jnp.asarray(_placement(3, 1))

    def _s2d_kernels(W1, W2):
        c1 = W1.shape[2]
        K1 = jnp.einsum("stpqabuv,uvcf->stpqcabf", P1, W1)
        K1 = K1.reshape(2, 2, 4 * c1, 256)
        K2 = jnp.einsum("stpqabuv,uvcf->stpqcabf", P2, W2)
        K2 = K2.reshape(3, 3, 256, 256)
        return K1, K2

    def _s2d_mask():
        import numpy as _np

        # zero the junk pixel row/col 321 (phase 1 of block row/col 160)
        m = _np.ones((1, 161, 161, 2, 2, 64), _np.float32)
        m[:, 160, :, 1, :, :] = 0.0
        m[:, :, 160, :, 1, :] = 0.0
        return m.reshape(1, 161, 161, 256)

    def block1_s2d(p, x):
        K1, K2 = _s2d_kernels(p["conv1_1"]["w"], p["conv1_2"]["w"])
        K1, K2 = K1.astype(bf16), K2.astype(bf16)
        mask = jnp.asarray(_s2d_mask(), bf16)
        b1 = jnp.tile(p["conv1_1"]["b"], 4).astype(bf16)
        b2 = jnp.tile(p["conv1_2"]["b"], 4).astype(bf16)

        B = x.shape[0]
        xc = jnp.pad(x.astype(bf16), ((0, 0), (1, 2), (1, 2), (0, 0)))
        X = xc.reshape(B, 162, 2, 162, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        X = X.reshape(B, 162, 162, 12)
        Y = jax.lax.conv_general_dilated(
            X, K1, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        Y = jax.nn.relu(Y + b1) * mask
        Y2 = jax.lax.conv_general_dilated(
            Y, K2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        Y2 = jax.nn.relu(Y2 + b2) * mask
        # pool1 (3x3 stride 2 SAME over the 321^2 pixel grid) = max over
        # (row in {2i-1,2i,2i+1}) x (col in {...}) = 9 phase-slices.
        yr = Y2.reshape(B, 161, 161, 2, 2, 64)

        def sel(pr, dr, qc, dc):
            t = yr[:, :, :, pr, qc, :]
            if dr:
                t = jnp.pad(t, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :161]
            if dc:
                t = jnp.pad(t, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :161]
            return t

        rows = [(1, 1), (0, 0), (1, 0)]  # (phase, shift-up?)
        out = None
        for pr, dr in rows:
            for qc, dc in rows:
                t = sel(pr, dr, qc, dc)
                out = t if out is None else jnp.maximum(out, t)
        return out

    from em_adapt_tpu.ops.block1_pallas import block1_fused

    def block1_pallas_fused(p, x):
        return block1_fused(
            x.astype(bf16), p["conv1_1"]["w"], p["conv1_1"]["b"],
            p["conv1_2"]["w"], p["conv1_2"]["b"])

    candidates = {
        "baseline": block1_baseline,
        "im2col_gw": block1_im2col,
        "im2col_both": block1_im2col_both,
        "s2d": block1_s2d,
        "pallas_fused": block1_pallas_fused,
    }

    def timed(fn):
        def loop(x, p):
            def body(i, acc):
                out = fn(p, x + acc * 1e-20)
                return acc + jnp.sum(out.astype(jnp.float32))
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        jl = jax.jit(loop)
        float(jl(x, params))
        t0 = time.perf_counter()
        float(jl(x, params))
        return (time.perf_counter() - t0) / args.iters

    def timed_grad(fn):
        def loss(p, x):
            return jnp.sum(fn(p, x).astype(jnp.float32) ** 2)

        def grad_all(x, p):
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

    for name, fn in candidates.items():
        tf_ = timed(fn)
        tb = timed_grad(fn)
        print(json.dumps({
            "candidate": name,
            "fwd_ms": round(tf_ * 1e3, 3),
            "fwdbwd_ms": round(tb * 1e3, 3),
        }), flush=True)

    # numeric parity of the custom grad (f32, this device)
    def gw(fn):
        def loss(p, x):
            return jnp.sum(fn(p, x).astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss))(params, x)

    g0 = gw(block1_baseline)
    g1 = gw(block1_im2col)
    err = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1))
    )
    print(json.dumps({"grad_rel_err_im2col_vs_xla": err}), flush=True)

    # value + grad parity of the s2d block vs baseline (bf16 rounding only)
    y0 = jax.jit(block1_baseline)(params, x)
    y1 = jax.jit(block1_s2d)(params, x)
    verr = float(jnp.max(jnp.abs(y0.astype(jnp.float32) - y1.astype(jnp.float32)))
                 / (jnp.max(jnp.abs(y0.astype(jnp.float32))) + 1e-30))
    g2 = gw(block1_s2d)
    gerr = max(
        float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(a)) + 1e-30))
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g2))
    )
    print(json.dumps({"s2d_out_rel_err": verr, "s2d_grad_rel_err": gerr}),
          flush=True)


if __name__ == "__main__":
    main()
