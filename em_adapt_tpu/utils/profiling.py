"""Profiling hooks.

The reference's only tracing is commented-out time.time() brackets
(reference deeplab.py:112-117, estep.py:19-26). Here profiling is
first-class: ``trace_context`` wraps a region in a jax.profiler trace
(viewable in XProf/TensorBoard), and ``StepTimer`` measures steady-state
step latency with proper device synchronization.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace_context(logdir: str | None):
    """Capture a jax.profiler trace of the enclosed region (no-op if
    logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def measure_estep_us_per_image(
    model_cfg,
    estep_cfg,
    batch_size: int,
    *,
    iters: int = 100,
    warmup: int = 2,
    mesh=None,
    data_axis: str = "data",
) -> float:
    """Measure the deployed E-step implementation at the run's score-map
    shape, in µs/image — the BASELINE.md metric (reference estep is
    38.7 ms/img numpy on CPU). Relay-safe SLOPE protocol (same as
    tools/bench_estep.py round 3): chains of ``iters`` and ``2*iters``
    in-graph iterations are each timed with one scalar fetch, and the
    difference per iteration cancels the constant per-dispatch relay
    round trip that otherwise dominates at this op size (a single-chain
    measurement read ~580 µs/img where the device compute is ~60).
    Two jits (persistently cached across invocations).

    Pass the run's ``mesh``/``data_axis`` (the trainer threads them into
    ``estep_labels``) so the measurement exercises the SAME impl choice
    the deployed train step makes — without them, a multi-device run
    would time the XLA fallback while the step runs the shard_mapped
    Pallas kernel. On a mesh that spans processes this contains a
    collective: every process must call it (see cli.py calibration)."""
    import jax.numpy as jnp

    from em_adapt_tpu.ops.estep import estep_labels, make_class_orders

    h = -(-model_cfg.input_size[0] // 8)
    w = -(-model_cfg.input_size[1] // 8)
    c = model_cfg.num_classes
    key = jax.random.key(0)
    scores = jax.random.normal(key, (batch_size, h, w, c), jnp.float32)
    label = jnp.asarray(
        jax.random.randint(key, (batch_size, h, w), 0, c), jnp.float32
    )
    orders = make_class_orders(key, estep_cfg.num_iter, c)

    def time_chain(n: int) -> float:
        @jax.jit
        def run(scores, label, orders):
            # iterations chained in-graph (iteration-dependent input
            # defeats CSE), scalar reduced in-graph, one fetch.
            def body(i, acc):
                out = estep_labels(
                    scores + acc * 1e-20, label, orders, estep_cfg,
                    mesh=mesh, data_axis=data_axis,
                )
                return acc + jnp.sum(out).astype(jnp.float32)

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        for _ in range(warmup):
            float(run(scores, label, orders))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(scores, label, orders))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        return samples[1]  # median of 3

    # Median-of-3 per chain: a single ~30 ms relay stall landing in the
    # shorter chain would make the difference negative and stamp
    # estep_us=0 into every train record of the run (the same rationale
    # as the round-3 bench protocol's median of dispatch intervals).
    dt = (time_chain(2 * iters) - time_chain(iters)) / iters
    return max(dt, 0.0) / batch_size * 1e6


class StepTimer:
    """Wall-clock timing that blocks on device results.

    Usage: call ``tick(result)`` once per step; read ``mean_s`` /
    ``p50_s`` (SECONDS) over the recorded window (warmup excluded).

    CAVEAT (this dev rig): ``jax.block_until_ready`` does NOT sync
    through the axon relay (CLAUDE.md), so here tick() measures dispatch
    intervals, not step latency — which is why none of the repo's benches
    use this class. It is correct on standard hosts (CPU, local TPU);
    for relay-safe timing reduce to a scalar in-graph and ``float()`` it
    (see measure_estep_us_per_image / bench.py)."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._count = 0
        self._last = None

    def tick(self, result=None) -> None:
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    @property
    def mean_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    @property
    def p50_s(self) -> float:
        if not self._times:
            return 0.0
        s = sorted(self._times)
        return s[len(s) // 2]
