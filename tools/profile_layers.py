"""Per-block TPU timing of the DeepLab-LargeFOV forward/backward pass.

The round-1 frontier note says step time is conv-bound with early VGG
blocks running far below MXU peak; this tool turns that hunch into a
committed per-layer profile (VERDICT round 1, next-step #2).

Method: build PREFIX models (block1, block1-2, ..., full head), run each
inside ONE jit with a fori-loop of ``iters`` iterations (iteration-
dependent input so XLA can't hoist the loop body), reduce to a scalar
in-graph and ``float()`` it — the only timing that works through the axon
relay (CLAUDE.md). Per-block time = adjacent prefix difference. The same
is done under ``jax.value_and_grad`` for the backward. Results print as
JSON lines with achieved TFLOP/s per block.

Usage:  python tools/profile_layers.py [--batch 6] [--iters 8] [--fwd-only]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


BLOCKS = [  # (name, layers included cumulatively)
    ("block1", ["conv1_1", "conv1_2"]),
    ("block2", ["conv2_1", "conv2_2"]),
    ("block3", ["conv3_1", "conv3_2", "conv3_3"]),
    ("block4", ["conv4_1", "conv4_2", "conv4_3"]),
    ("block5", ["conv5_1", "conv5_2", "conv5_3"]),
    ("fc6", ["fc6"]),
    ("fc7", ["fc7"]),
    ("fc8", ["fc8"]),
]


def conv_flops(hw: int, kh: int, kw: int, cin: int, cout: int) -> float:
    return hw * kh * kw * cin * cout * 2.0


def block_flops(input_hw: int = 321) -> dict[str, float]:
    """Forward FLOPs per block per image (ceil-SAME OS-8 spatial sizes)."""
    s321, s161, s81, s41 = 321 * 321, 161 * 161, 81 * 81, 41 * 41
    return {
        "block1": conv_flops(s321, 3, 3, 3, 64) + conv_flops(s321, 3, 3, 64, 64),
        "block2": conv_flops(s161, 3, 3, 64, 128) + conv_flops(s161, 3, 3, 128, 128),
        "block3": conv_flops(s81, 3, 3, 128, 256) + 2 * conv_flops(s81, 3, 3, 256, 256),
        "block4": conv_flops(s41, 3, 3, 256, 512) + 2 * conv_flops(s41, 3, 3, 512, 512),
        "block5": 3 * conv_flops(s41, 3, 3, 512, 512),
        "fc6": conv_flops(s41, 4, 4, 512, 4096),
        "fc7": conv_flops(s41, 1, 1, 4096, 4096),
        "fc8": conv_flops(s41, 1, 1, 4096, 21),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--fwd-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from em_adapt_tpu.config import ModelConfig
    from em_adapt_tpu.models import DeepLabLargeFOV
    from em_adapt_tpu.models.deeplab import POOLS, vgg_conv_specs
    from em_adapt_tpu.ops.conv import conv2d_same
    from em_adapt_tpu.ops.pooling import max_pool_same

    cfg = ModelConfig(compute_dtype=args.dtype)
    model = DeepLabLargeFOV(cfg)
    params = model.init(jax.random.key(0))
    compute_dtype = jnp.bfloat16 if args.dtype == "bfloat16" else None

    specs = {name: rate for name, _, _, _, _, rate in vgg_conv_specs(cfg)}
    specs.update(fc6=cfg.fc6_rate, fc7=1, fc8=1)

    def prefix_forward(x, params, upto: str):
        h = x if compute_dtype is None else x.astype(compute_dtype)
        done = False
        for name, layers in BLOCKS:
            for layer in layers:
                p = params[layer]
                h = conv2d_same(h, p["w"], p["b"], rate=specs[layer],
                                compute_dtype=compute_dtype)
                if layer != "fc8":
                    h = jax.nn.relu(h)
                if layer in POOLS:
                    h = max_pool_same(h, window=3, stride=POOLS[layer])
            if name == upto:
                done = True
                break
        assert done
        return h.astype(jnp.float32)

    g = np.random.default_rng(0)
    x = jnp.asarray(g.normal(size=(args.batch, 321, 321, 3)) * 40,
                    jnp.float32)

    def timed(fn):
        """One jit, iters iterations chained in-graph, scalar out."""
        def loop(x, params):
            def body(i, acc):
                out = fn(x + acc * 1e-20, params)
                return acc + jnp.sum(out)
            return jax.lax.fori_loop(0, args.iters, body, jnp.float32(0))
        jl = jax.jit(loop)
        float(jl(x, params))  # compile + warm
        t0 = time.perf_counter()
        float(jl(x, params))
        return (time.perf_counter() - t0) / args.iters

    flops = block_flops()
    results = []
    prev_f, prev_b = 0.0, 0.0
    cum_flops = 0.0
    for name, _ in BLOCKS:
        t_f = timed(lambda x, p, n=name: prefix_forward(x, p, n))
        rec = {"block": name, "cum_fwd_ms": round(t_f * 1e3, 3),
               "fwd_ms": round((t_f - prev_f) * 1e3, 3)}
        cum_flops += flops[name] * args.batch
        dt = t_f - prev_f
        rec["fwd_tflops"] = round(flops[name] * args.batch / max(dt, 1e-9) / 1e12, 2)
        if not args.fwd_only:
            def loss(p, x, n=name):
                return jnp.sum(prefix_forward(x, p, n) ** 2)

            def grad_all(x, p, n=name):
                # Sum over EVERY grad leaf — returning a single leaf lets
                # XLA dead-code-eliminate the other layers' weight-grad
                # matmuls and under-reports the backward by ~2x.
                g_tree = jax.grad(loss)(p, x)
                return sum(
                    jnp.sum(g.astype(jnp.float32))
                    for g in jax.tree.leaves(g_tree)
                )

            t_b = timed(grad_all)
            rec["cum_fwdbwd_ms"] = round(t_b * 1e3, 3)
            rec["fwdbwd_ms"] = round((t_b - prev_b) * 1e3, 3)
            rec["fwdbwd_tflops"] = round(
                3 * flops[name] * args.batch / max(t_b - prev_b, 1e-9) / 1e12, 2
            )
            prev_b = t_b
        prev_f = t_f
        results.append(rec)
        print(json.dumps(rec), flush=True)
    total = {"block": "TOTAL",
             "cum_fwd_ms": results[-1]["cum_fwd_ms"],
             "fwd_tflops": round(cum_flops / (prev_f) / 1e12, 2)}
    if not args.fwd_only:
        total["cum_fwdbwd_ms"] = results[-1]["cum_fwdbwd_ms"]
    print(json.dumps(total), flush=True)


if __name__ == "__main__":
    main()
