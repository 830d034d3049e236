"""Orbax checkpointing of the FULL train state.

Fixes the reference's resume gap (SURVEY.md §5): the reference saved
trainable variables only — momentum slots, accumulators, step and LR were
lost and "resume" was warm-start-only (reference network.py:100-102,
deeplab.py:229-234). Here a checkpoint is the complete TrainState (params
+ optimizer state incl. MultiSteps accumulators + step + PRNG key), so a
restore continues bit-where-it-left-off, including the LR schedule
position.

Cadence knobs mirror the reference: rolling "norm" saves (max_to_keep=2,
reference network.py:100) plus "lr" snapshots right before each LR drop
(reference deeplab.py:248, :254, :260).
"""

from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp

from em_adapt_tpu.config import CheckpointConfig


class CheckpointManager:
    def __init__(self, cfg: CheckpointConfig):
        self.cfg = cfg
        self._managers: dict[str, ocp.CheckpointManager] = {}
        #: steps THIS process already saved per tag (lineage tracking for
        #: the duplicate-step rule in :meth:`save`)
        self._saved_steps: dict[str, set[int]] = {}

    def _manager(self, tag: str) -> ocp.CheckpointManager:
        if tag not in self._managers:
            path = os.path.abspath(os.path.join(self.cfg.save_dir, tag))
            options = ocp.CheckpointManagerOptions(
                max_to_keep=self.cfg.max_to_keep if tag == "norm" else None,
                enable_async_checkpointing=self.cfg.async_save,
            )
            self._managers[tag] = ocp.CheckpointManager(path, options=options)
        return self._managers[tag]

    def save(self, state, *, tag: str = "norm") -> None:
        step = int(jax.device_get(state.step))
        mgr = self._manager(tag)
        seen = self._saved_steps.setdefault(tag, set())
        if step in seen:
            # Same step saved by THIS run: the state is identical (the
            # step counter advances inside the jitted step), so skipping
            # is correct — a preemption signal landing right after a
            # cadence save, or the final save coinciding with a cadence
            # boundary. orbax would raise StepAlreadyExistsError.
            return
        if step in mgr.all_steps():
            # Same step from a DIFFERENT run reusing this save_dir (e.g.
            # a warm-start fine-tune writing in place): the state is NOT
            # the old one — newest write wins, silently keeping the stale
            # checkpoint would be data loss.
            mgr.delete(step)
        mgr.save(step, args=ocp.args.StandardSave(state))
        seen.add(step)

    def restore(self, template, *, tag: str = "norm", step: int | None = None):
        """Restore into the structure of ``template`` (an abstract or
        concrete TrainState with the right pytree/shapes/shardings)."""
        mgr = self._manager(tag)
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint under {self.cfg.save_dir}/{tag}"
            )
        return mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_saved(self, *, tag: str = "norm", step: int | None = None):
        """Restore the checkpoint's OWN saved structure (no template; host
        arrays, pytree nodes as nested dicts). Survives TrainState tree
        changes across runs — e.g. an ``optim.accum_steps`` change reshapes
        the MultiSteps slots, which makes a template-driven restore fail
        even though the params subtree is perfectly loadable."""
        mgr = self._manager(tag)
        step = mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(
                f"no checkpoint under {self.cfg.save_dir}/{tag}"
            )
        return mgr.restore(step, args=ocp.args.StandardRestore())

    def latest_step(self, tag: str = "norm") -> int | None:
        return self._manager(tag).latest_step()

    def wait(self) -> None:
        """Block until async saves are durable (call before exit)."""
        for m in self._managers.values():
            m.wait_until_finished()

    def close(self) -> None:
        self.wait()
        for m in self._managers.values():
            m.close()
        self._managers.clear()
