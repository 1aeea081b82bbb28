"""Checkpoint save/restore (orbax).

Capability parity with Lightning's ModelCheckpoint usage
(`/root/reference/main_recon.py:103`, save_last + every
checkpoint_freq steps) — plus a fix the reference lacks: the bubble
pdf/sample_count are part of the checkpoint, so mid-bubble resume
restores importance sampling instead of silently re-initializing
(reference gap documented in SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp

from .state import TrainState


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: int = 3):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: TrainState,
             bubble: dict | None = None) -> None:
        payload = {
            "state": {
                "step": state.step,
                "params": state.params,
                "opt_state": state.opt_state,
            },
        }
        if bubble is not None:
            payload["bubble"] = bubble
        # async write: orbax copies device->host synchronously inside
        # save() (so donated buffers are safe to reuse immediately) and
        # streams to disk in the background; training overlaps the
        # write. A still-pending save is finalized by the NEXT save, by
        # restore()/close(), or by wait_until_finished().
        self._mgr.save(step, args=ocp.args.StandardSave(payload))

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState,
                bubble_template: dict | None = None,
                step: int | None = None):
        """Returns (TrainState, bubble dict | None)."""
        self._mgr.wait_until_finished()  # a pending async save may hold
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint under {self.ckpt_dir}")
        template: dict[str, Any] = {
            "state": {
                "step": state_template.step,
                "params": state_template.params,
                "opt_state": state_template.opt_state,
            },
        }
        if bubble_template is not None:
            template["bubble"] = bubble_template
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template))
        st = restored["state"]
        state = TrainState(step=st["step"], params=st["params"],
                           opt_state=st["opt_state"])
        return state, restored.get("bubble")

    def close(self) -> None:
        self._mgr.close()
