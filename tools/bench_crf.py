"""denseCRF eval-path benchmark + approximation-quality probe.

Round-2 VERDICT weakness #6: the published number's protocol (1,449 val
images x 10 mean-field iterations, reference readme.md:40 +
network.py:63 hyperparameters) had no measured cost, the per-image CRF
loop was single-threaded, and lattice-vs-exact error was only quantified
on tiny test images. This tool measures both:

* throughput: seconds/image and images/sec for the permutohedral-lattice
  and bilateral-grid CRFs at a realistic VOC resolution (375x500),
  single-threaded AND through the evaluate_voc worker pool
  (EvalConfig.crf_workers; the native lattice's ctypes calls release the
  GIL, so threads scale on multi-core eval hosts — this 1-core dev rig
  shows the pool overhead floor instead).
* quality: label-flip rate and probability MAE of each approximation vs
  the EXACT O((HW)^2) kernels at 128x128 with the REFERENCE
  hyperparameters (bilateral sxy=121, srgb=5 — the big-cell regime the
  round-2 tiny-image probes never exercised).

Round-3 addition: --tpu measures the on-device batched CRF
(eval/crf_tpu.py) with the repo's slope protocol — the 10-iteration
refinement cost is t(2K iters) - t(K iters), which cancels the constant
per-dispatch relay round trip (CLAUDE.md), with an in-graph scalar
reduction as the only fetch.

Prints one JSON line per measurement. Usage:
    python tools/bench_crf.py [--size 375x500] [--images 4] [--threads 4]
                              [--skip-exact] [--tpu] [--tpu-only]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _synthetic_image(h: int, w: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """A piecewise-constant 'photo' (blobs + noise) and soft unaries that
    roughly follow its regions — the structure CRFs actually sharpen."""
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    regions = (
        (yy / h > 0.4).astype(int)
        + 2 * ((xx / w - 0.5) ** 2 + (yy / h - 0.45) ** 2 < 0.08).astype(int)
    )
    palette = np.array(
        [[40, 90, 160], [90, 150, 60], [200, 80, 60], [230, 210, 120]],
        np.float32,
    )
    rgb = palette[regions] + g.normal(0, 8, size=(h, w, 3))
    rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    c = 4
    # weak, noisy unaries: confident regions saturate the mean-field
    # softmax (compat 10 x filtered mass) after one iteration and every
    # method trivially agrees — the interesting regime is uncertainty
    logits = g.normal(0, 0.8, size=(h, w, c)).astype(np.float32)
    for r in range(4):
        logits[..., r] += 0.8 * (regions == r)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return rgb, (e / e.sum(-1, keepdims=True)).astype(np.float32)


def _bench_tpu(cfg, data, h: int, w: int) -> None:
    """Slope-protocol device timing of the batched CRF: the K-iteration
    mean-field cost = t(2K) - t(K) per batch (splat/blur/slice all sit
    inside the fori_loop body, so compute scales linearly in iterations
    while the dispatch constant cancels)."""
    import jax
    import jax.numpy as jnp

    from em_adapt_tpu.eval.crf_tpu import _compiled_scalar_probe

    rgbs = np.stack([rgb for rgb, _ in data])
    probs = np.stack([p for _, p in data])
    masks = np.ones(probs.shape[:3], np.float32)
    k = cfg.crf_iterations

    def timed(iters: int) -> float:
        fn = _compiled_scalar_probe(cfg, iters)
        p, r, m = jnp.asarray(probs), jnp.asarray(rgbs), jnp.asarray(masks)
        float(fn(p, r, m))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fn(p, r, m))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1, t2 = timed(k), timed(2 * k)
    per_image = (t2 - t1) / len(data)
    print(json.dumps({
        "bench": "crf_throughput", "method": "tpu_grid",
        "device": jax.devices()[0].device_kind, "size": f"{h}x{w}",
        "batch": len(data), "iterations": k,
        "s_per_image": round(per_image, 5),
        "images_per_sec": round(1 / per_image, 2),
        "full_val_minutes": round(per_image * 1449 / 60, 2),
    }), flush=True)

    # sanity: device output must match the host grid path on one image
    from em_adapt_tpu.eval.crf import dense_crf
    from em_adapt_tpu.eval.crf_tpu import dense_crf_tpu

    rgb0, p0 = data[0]
    got = dense_crf_tpu(p0, rgb0, cfg)
    want = dense_crf(p0, rgb0, cfg, method="grid")
    print(json.dumps({
        "bench": "crf_tpu_vs_host_grid", "size": f"{h}x{w}",
        "label_agreement": round(float((got.argmax(-1) == want.argmax(-1)).mean()), 5),
        "prob_mae": float(f"{np.abs(got - want).mean():.3g}"),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="375x500")
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--exact-size", type=int, default=128)
    ap.add_argument("--exact-iters", type=int, default=2)
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--tpu", action="store_true",
                    help="also bench the on-device batched CRF")
    ap.add_argument("--tpu-only", action="store_true")
    args = ap.parse_args()
    if args.tpu_only:
        args.tpu = True

    from em_adapt_tpu.config import EvalConfig
    from em_adapt_tpu.eval.crf import (
        _bilateral_feats,
        _exact_kernel_filter,
        _spatial_feats,
        dense_crf,
    )
    from em_adapt_tpu.eval.permutohedral import available

    h, w = (int(x) for x in args.size.split("x"))
    cfg = EvalConfig()
    cases = [("grid", "grid")]
    if available():
        cases.insert(0, ("permutohedral", "permutohedral"))

    data = [_synthetic_image(h, w, s) for s in range(args.images)]

    if args.tpu:
        _bench_tpu(cfg, data, h, w)
        if args.tpu_only:
            return

    for name, method in cases:
        # single-threaded cost of the full 10-iteration refinement
        t0 = time.perf_counter()
        for rgb, probs in data:
            dense_crf(probs, rgb, cfg, method=method)
        dt = (time.perf_counter() - t0) / len(data)
        print(json.dumps({
            "bench": "crf_throughput", "method": name, "size": f"{h}x{w}",
            "iterations": cfg.crf_iterations, "threads": 1,
            "s_per_image": round(dt, 3),
            "images_per_sec": round(1 / dt, 3),
            "full_val_minutes": round(dt * 1449 / 60, 1),
        }), flush=True)

        # through the worker pool (the evaluate_voc configuration)
        from concurrent.futures import ThreadPoolExecutor

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.threads) as pool:
            list(pool.map(
                lambda a: dense_crf(a[1], a[0], cfg, method=method), data
            ))
        dt = (time.perf_counter() - t0) / len(data)
        print(json.dumps({
            "bench": "crf_throughput", "method": name, "size": f"{h}x{w}",
            "iterations": cfg.crf_iterations, "threads": args.threads,
            "s_per_image": round(dt, 3),
            "images_per_sec": round(1 / dt, 3),
            "full_val_minutes": round(dt * 1449 / 60, 1),
        }), flush=True)

    if args.skip_exact:
        return

    # quality vs the exact kernels at the reference hyperparameters
    n = args.exact_size
    rgb, probs = _synthetic_image(n, n, 7)
    iters = args.exact_iters
    want = dense_crf(probs, rgb, cfg, num_iterations=iters, method="exact")
    for name, method in cases:
        got = dense_crf(probs, rgb, cfg, num_iterations=iters, method=method)
        flip = float((got.argmax(-1) != want.argmax(-1)).mean())
        mae = float(np.abs(got - want).mean())
        print(json.dumps({
            "bench": "crf_vs_exact", "method": name,
            "size": f"{n}x{n}", "iterations": iters,
            "bi_sxy": cfg.crf_bi_sxy, "bi_srgb": cfg.crf_bi_srgb,
            "label_flip_rate": round(flip, 5),
            "prob_mae": float(f"{mae:.3g}"),
            "prob_max_abs_diff": float(f"{np.abs(got - want).max():.3g}"),
        }), flush=True)
    # how much the CRF moves labels at all (context for the flip rates)
    base_flip = float((want.argmax(-1) != probs.argmax(-1)).mean())
    print(json.dumps({
        "bench": "crf_vs_exact", "method": "unary_vs_exact",
        "size": f"{n}x{n}", "iterations": iters,
        "label_flip_rate": round(base_flip, 5),
    }), flush=True)


if __name__ == "__main__":
    main()
