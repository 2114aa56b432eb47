"""Optimization-state checkpointing (orbax).

The reference's only "checkpoints" are per-frame PNGs a crashed animation can
be re-stitched from (Game1.cs:156-161, :192-210, SURVEY.md §5).  Inverse-
rendering runs (BASELINE config 4) get real checkpoint/resume: params +
optimizer state saved every N steps, restored by diff/fit.py on restart.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp


class FitCheckpointer:
    """Step-numbered pytree checkpoints under one directory."""

    def __init__(self, directory: str, keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep),
        )

    def save(self, step: int, state: Any) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def restore_latest(self, template: Any) -> Optional[Tuple[int, Any]]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return step, state

    def close(self) -> None:
        self._mgr.close()
