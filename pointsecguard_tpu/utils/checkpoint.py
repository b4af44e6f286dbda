"""Checkpointing: one orbax-backed pytree per experiment.

Replaces the reference's three checkpoint formats (torch state dicts
`train_semseg.py:188-198`, `utils/ckpt_util.py:27-114`; TF1 Saver
snapshots `RandLANet.py:141-142`) with a single checkpoint containing
{params, batch_stats, opt_state, step, epoch, best_miou}; best-model
tracking mirrors `train_semseg.py:251-263`.
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class CheckpointManager:
    """Thin orbax wrapper: periodic saves + best-mIoU copy + auto-resume.

    ``keep="best"`` retains the ``max_to_keep`` highest-miou steps
    (`train_semseg.py:251-263` semantics — right when the metric is a
    real validation mIoU). ``keep="latest"`` retains the newest steps
    regardless of metric — the reference ResGCN driver's
    ``_ckpt_latest.pth`` behavior (`utils/ckpt_util.py:109-114`), and
    required when the save metric is only a loss proxy: under best-mode
    a resumed run whose proxy never beats the old best gets every new
    save garbage-collected immediately, so the resume persists NOTHING
    (observed on a resumed ResGCN run at decayed lr)."""

    def __init__(self, directory: str, *, max_to_keep: int = 5,
                 keep: str = "best"):
        if keep not in ("best", "latest"):
            raise ValueError(f"keep must be 'best' or 'latest', got {keep!r}")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        best_kw = (
            dict(best_fn=lambda m: m.get("miou", 0.0), best_mode="max")
            if keep == "best"
            else {}
        )
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, **best_kw
            ),
        )

    def save(self, step: int, state: Any, *, miou: float = 0.0) -> None:
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics={"miou": float(miou)},
        )
        self._mgr.wait_until_finished()

    def restore_latest(self, template: Any) -> tuple[Any, int] | None:
        """→ (state, step) of the newest checkpoint, or None
        (best-effort auto-resume, `train_semseg.py:115-123`)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step

    def restore_best(self, template: Any) -> tuple[Any, int] | None:
        step = self._mgr.best_step()
        if step is None:
            return None
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state, step
