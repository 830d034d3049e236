"""Failure detection and graceful-preemption handling.

The reference has none of this (SURVEY.md §5): a crash loses up to 6000
steps (its checkpoint cadence) and preemption is an uncontrolled kill.
Here the trainer registers signal handlers (SIGTERM — the preemption
signal on cloud TPU VMs — and SIGINT): on first delivery a flag flips and
the training loop checkpoints the full state and exits cleanly at the next
step boundary; a second signal falls through to the default handler.

NaN/static-loss watchdog: ``LossWatchdog`` flags diverged (non-finite) or
dead (bitwise-frozen) losses so the driver can stop early instead of
burning a full schedule.
"""

from __future__ import annotations

import math
import signal
import threading


class GracefulShutdown:
    """Flag-based signal trap; use as a context manager around the loop."""

    SIGNALS = (signal.SIGTERM, signal.SIGINT)

    def __init__(self):
        self._flag = threading.Event()
        self._prev = {}
        self._published = False  # see requested_uniform

    @property
    def requested(self) -> bool:
        return self._flag.is_set()

    def requested_uniform(self) -> bool:
        """Cross-process OR of ``requested`` — use this when the flag
        gates a COLLECTIVE action (the trainer's preemption save is a
        multi-process orbax save: if SIGTERM reached only some processes,
        the signaled ones would enter the collective while the others
        keep dispatching train steps, deadlocking the job as it is being
        preempted).

        Mechanism: the jax distributed coordinator's key-value store (a
        host-side RPC — deliberately NOT a device collective, which would
        enqueue behind the in-flight dispatch and serialize the pipeline
        this loop exists to keep full). A process that saw a signal
        publishes once; everyone polls per dispatch. Single-process (or
        no distributed client / old jaxlib without key_value_try_get):
        falls back to the local flag."""
        local = self._flag.is_set()
        try:
            import jax

            if jax.process_count() <= 1:
                return local
            from jax._src import distributed

            client = distributed.global_state.client
            if client is None or not hasattr(client, "key_value_try_get"):
                return local
            key = "em_adapt/shutdown_requested"
            if local and not self._published:
                client.key_value_set(key, "1")
                self._published = True
            if local:
                return True
            try:
                client.key_value_try_get(key)
                return True  # some process published the signal
            except Exception:
                return False  # key absent: nobody signaled yet
        except Exception:
            return local

    def agreed_stop_step(self, proposal: int) -> int:
        """Cross-process agreement on the EXACT step to stop at.

        ``requested_uniform`` makes the stop DECISION uniform, but each
        process observes it at its own next loop boundary — and the
        per-dispatch watchdog fetch bounds inter-process dispatch skew
        to ONE window, so two processes can sit one dispatch apart when
        the flag flips. Stopping at different steps deadlocks the job:
        the ahead process's last psum never completes (its peer stopped
        dispatching), so its pre-save device_get hangs right as the job
        is being preempted — observed as a Gloo context-init
        DEADLINE_EXCEEDED on the 2-process CPU dryrun.

        Protocol: the first process to see the uniform flag publishes
        ``proposal`` (its step index + one more dispatch window) to the
        coordination-service KV store; everyone adopts the FIRST
        published value (first-writer-wins — a second ``key_value_set``
        on the same key fails and the loser reads the winner's value).
        Because skew is bounded by one window and every process proposes
        its own next boundary, the winning value is >= every process's
        current dispatched step, so each process can reach it by
        dispatching zero or one more window — no process ever has to
        un-dispatch, and all enter the collective save at the same step.

        Single-process (or no distributed client): returns ``proposal``
        unchanged — the caller passes the CURRENT step there, preserving
        the proven stop-immediately behavior."""
        try:
            import jax

            if jax.process_count() <= 1:
                return proposal
            from jax._src import distributed

            client = distributed.global_state.client
            if client is None:
                return proposal
            key = "em_adapt/stop_step"
            try:
                client.key_value_set(key, str(proposal))
            except Exception:
                pass  # a peer published first: adopt theirs below
            try:
                return int(client.key_value_get(key, 10_000))
            except Exception:
                return proposal
        except Exception:
            return proposal

    def _handler(self, signum, frame):
        if self._flag.is_set():
            # second signal: restore default behavior and re-raise
            signal.signal(signum, self._prev.get(signum, signal.SIG_DFL))
            signal.raise_signal(signum)
        self._flag.set()

    def __enter__(self):
        if threading.current_thread() is threading.main_thread():
            for s in self.SIGNALS:
                self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev.clear()
        return False


class LossWatchdog:
    """Detects diverged (NaN/inf) and dead (frozen) training.

    ``check(loss)`` returns None while healthy, else a reason string.
    A loss is "dead" if it is bit-identical for ``patience`` consecutive
    checks — the signature of a broken data pipeline or zero LR.
    """

    def __init__(self, patience: int = 50):
        self.patience = patience
        self._last: float | None = None
        self._repeat = 0

    def check(self, loss: float) -> str | None:
        loss = float(loss)
        if not math.isfinite(loss):
            return f"non-finite loss: {loss}"
        if self._last is not None and loss == self._last:
            self._repeat += 1
            if self._repeat >= self.patience:
                return (
                    f"loss frozen at {loss} for {self._repeat} consecutive "
                    "checks (dead pipeline or zero LR?)"
                )
        else:
            self._repeat = 0
        self._last = loss
        return None
