"""Orbax checkpointing with the reference's recent/final policy.

Parity target: cubercnn/solver/checkpoint.py:5-28
(PeriodicCheckpointerOnlyOne): a single overwritten `model_recent` plus a
`model_final` at the end; checkpoints carry {params, batch_stats, opt_state,
step} and resume restores the iteration.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, output_dir: str, period: int, max_iter: int):
        self.output_dir = os.path.abspath(output_dir)
        self.period = period
        self.max_iter = max_iter
        os.makedirs(self.output_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> str:
        return os.path.join(self.output_dir, name)

    def save(self, name: str, state: Any):
        path = self._path(name)
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()

    def step(self, iteration: int, state: Any):
        """Periodic save: overwrite model_recent; model_final at the end."""
        if (iteration + 1) % self.period == 0:
            self.save("model_recent", state)
        if iteration >= self.max_iter - 1:
            self.save("model_final", state)

    def restore(self, name: str, abstract_state: Any) -> Optional[Any]:
        path = self._path(name)
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path, abstract_state)

    def resume_or_load(self, abstract_state: Any, resume: bool = True):
        """Latest recent/final checkpoint if resume, else None."""
        if not resume:
            return None
        for name in ("model_final", "model_recent"):
            out = self.restore(name, abstract_state)
            if out is not None:
                return out
        return None
