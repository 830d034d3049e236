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

    def _manager(self, tag: str) -> ocp.CheckpointManager:
        if tag not in self._managers:
            path = os.path.abspath(os.path.join(self.cfg.save_dir, tag))
            # Retention: "norm" rolls (reference network.py:100
            # max_to_keep=2); "best" also rolls — only the latest best is
            # ever restored, and keep-all grew one full TrainState
            # (params + momentum + accumulators) per eval improvement;
            # "lr" keeps all (exactly len(lr_schedule) snapshots per run,
            # each a distinct reference-contract artifact,
            # reference deeplab.py:248).
            keep = self.cfg.max_to_keep if tag in ("norm", "best") else None
            options = ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                enable_async_checkpointing=self.cfg.async_save,
            )
            self._managers[tag] = ocp.CheckpointManager(path, options=options)
        return self._managers[tag]

    def save(self, state, *, tag: str = "norm") -> None:
        step = int(jax.device_get(state.step))
        mgr = self._manager(tag)
        if step in mgr.all_steps():
            # Step collision: a legitimate re-save of the same state (a
            # preemption signal right after a cadence save; the final
            # save landing on a cadence boundary) or a DIFFERENT lineage
            # reusing the save_dir (warm-start fine-tune in place, or a
            # second fit() on one process). The states can differ, so
            # newest-write-wins is the only always-correct rule: rewrite
            # unconditionally (orbax would raise StepAlreadyExistsError).
            # An in-flight async save of this very step must finish
            # before the delete or they race on the step directory.
            mgr.wait_until_finished()
            mgr.delete(step)
        mgr.save(step, args=ocp.args.StandardSave(state))

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
