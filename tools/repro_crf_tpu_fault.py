"""Minimal repro: vmapped bilateral-grid CRF faults the TPU runtime.

Found round 4 (2026-08-20, TPU v5e behind the axon relay, jax 0.8.x)
while measuring CRF accuracy-cost on a trained checkpoint: the BATCHED
(jax.vmap) device-CRF reproducibly kills the TPU worker ("UNAVAILABLE:
TPU worker process crashed or restarted. This can be caused by a kernel
fault" — sometimes "INTERNAL: TPU backend error") on one specific
6-image batch, while

* each of those 6 images passes INDIVIDUALLY (1 real + 5 zero pads),
* other 6-image batches from the same distribution pass,
* the same batch passes with crf_iterations=0,
* the bilateral splat/blur/slice alone passes on these very guides
  with uniform q (the trained model's peaked probabilities are part of
  the trigger — a one-hot-blend synthetic q does NOT reproduce),
* and the IDENTICAL math via jax.lax.map (sequential per-image inside
  one jit) passes.

The implicated program is vmap's batched lowering of the scatter-add
splat (`jnp.zeros(...).at[flat].add(vals)`) composed with the
mean-field fori_loop — every index provably in-bounds (color cells
<= gc-1 by construction, spatial cells static). Valid HLO must not be
able to crash the worker, so this is an XLA:TPU / runtime bug; the
framework ships the lax.map formulation
(eval/crf_tpu.py::_compiled_batch, eval/predict.py::
_make_device_voc_post), cost-free because the CRF is compute-bound with
flat batch scaling (PROFILE.md).

The EXACT faulting inputs (the trained model's upsampled softmax probs
+ guide images, captured once) are committed as
tests/fixtures/crf_tpu_fault_inputs.npz, so the repro is fully
self-contained — no checkpoint needed.

Usage:
  python tools/repro_crf_tpu_fault.py          # safe lax.map path: must pass
  python tools/repro_crf_tpu_fault.py --vmap   # faulting path: expect the
                                               # worker to crash (exit != 0)
"""

from __future__ import annotations

import argparse
import functools
import os

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "crf_tpu_fault_inputs.npz",
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vmap", action="store_true",
                    help="run the FAULTING vmapped formulation (kills the "
                         "TPU worker process on the repro batch)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/em_adapt_jax_cache")
    from em_adapt_tpu.eval.crf_tpu import _crf_refine_one

    d = np.load(FIXTURE)
    probs = jnp.asarray(d["probs"])   # [6,129,129,4] f32, sums to 1
    rgb = jnp.asarray(d["rgb"])       # [6,129,129,3] uint8 guides
    mask = jnp.ones(probs.shape[:3], jnp.float32)

    fn = functools.partial(
        _crf_refine_one, bi_sxy=121.0, bi_srgb=5.0, bi_compat=10.0,
        g_sxy=3.0, g_compat=3.0, iterations=10,
    )
    if args.vmap:
        print("running the FAULTING vmapped program (expect a TPU worker "
              "crash on v5e/axon) ...", flush=True)
        out = jax.jit(jax.vmap(fn))(probs, rgb, mask)
    else:
        out = jax.jit(
            lambda p, r, m: jax.lax.map(lambda a: fn(*a), (p, r, m))
        )(probs, rgb, mask)
    total = float(jnp.sum(out))
    print(f"ok: refined probs sum {total:.1f} "
          f"({'vmap' if args.vmap else 'lax.map'} formulation, "
          f"platform {jax.devices()[0].platform})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
