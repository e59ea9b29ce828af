"""Checkpoint / resume of solver state.

The reference has no mid-run checkpointing — only terminal ``.npz`` export
(``simulation_result.py:296-314``) — flagged in SURVEY §5 as a gap to fill.
Here long runs checkpoint ``(u, v, p, iteration, residual histories)`` via
orbax, enabling resume of large-grid solves.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..core.state import FlowState


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: FlowState, iteration: int = 0,
                    histories: Optional[dict] = None, metadata: Optional[dict] = None):
    """Write a checkpoint directory (orbax PyTree format)."""
    payload = {
        "u": state.u,
        "v": state.v,
        "p": state.p,
        "iteration": np.asarray(iteration, np.int64),
        "histories": {k: np.asarray(val) for k, val in (histories or {}).items()},
        "metadata": {k: np.asarray(val) for k, val in (metadata or {}).items()},
    }
    path = os.path.abspath(path)
    _checkpointer().save(path, payload, force=True)
    return path


def load_checkpoint(path: str):
    """Read a checkpoint; returns (FlowState, iteration, histories, metadata)."""
    payload = _checkpointer().restore(os.path.abspath(path))
    state = FlowState(
        u=jax.numpy.asarray(payload["u"]),
        v=jax.numpy.asarray(payload["v"]),
        p=jax.numpy.asarray(payload["p"]),
    )
    return (
        state,
        int(payload["iteration"]),
        payload.get("histories", {}),
        payload.get("metadata", {}),
    )


class CheckpointManager:
    """Periodic checkpointing helper for host-driven solve loops."""

    def __init__(self, directory: str, every: int = 100, keep: int = 2):
        self.directory = directory
        self.every = every
        self.keep = keep
        # seed from existing step_* dirs so pruning keeps working (and the
        # keep-window stays bounded) across resumed runs
        self._saved = []
        if os.path.isdir(directory):
            self._saved = [
                os.path.join(directory, d)
                for d in sorted(os.listdir(directory))
                if d.startswith("step_")
            ]

    def maybe_save(self, state: FlowState, iteration: int, histories=None):
        if self.every <= 0 or iteration % self.every:
            return None
        path = os.path.join(self.directory, f"step_{iteration:08d}")
        save_checkpoint(path, state, iteration, histories)
        self._saved.append(path)
        while len(self._saved) > self.keep:
            old = self._saved.pop(0)
            import shutil

            shutil.rmtree(old, ignore_errors=True)
        return path

    def latest(self) -> Optional[str]:
        if self._saved:
            return self._saved[-1]
        if os.path.isdir(self.directory):
            steps = sorted(
                d for d in os.listdir(self.directory) if d.startswith("step_")
            )
            if steps:
                return os.path.join(self.directory, steps[-1])
        return None
