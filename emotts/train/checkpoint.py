"""Orbax checkpointing: full train state + best-params export.

Covers the reference's artifact contract (best/last weights per experiment,
SURVEY.md §5 checkpoint row) and adds what it lacks: optimizer state, step
counter and RNG key for exact preemption-safe resume, async saves, and
retention of the last N checkpoints.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from emotts.train.state import TrainState


def make_orbax_manager(ckpt_dir: str, keep: int = 3) -> ocp.CheckpointManager:
    """The one place the retention/async checkpoint options live — used by
    :class:`CheckpointManager` and the vocoder trainer's paired-state
    checkpoints alike, so the semantics cannot drift apart."""
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=True
    )
    return ocp.CheckpointManager(ckpt_dir, options=options)


class CheckpointManager:
    """Step-indexed full-state checkpoints under <exp>/checkpoints plus a
    single 'best' params-only export under <exp>/best."""

    def __init__(self, exp_path: str, keep: int = 3):
        self.exp_path = Path(exp_path)
        self.ckpt_dir = (self.exp_path / "checkpoints").absolute()
        self.best_dir = (self.exp_path / "best").absolute()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._mgr = make_orbax_manager(str(self.ckpt_dir), keep)
        self._best = ocp.StandardCheckpointer()

    def save(self, state: TrainState) -> None:
        self._mgr.save(
            int(jax.device_get(state.step)), args=ocp.args.StandardSave(state)
        )

    def restore(self, template: TrainState) -> Optional[TrainState]:
        """Restore the latest checkpoint into the template's structure, or
        None if no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def save_best(self, params: Any) -> None:
        """Export best-on-validation params (the reference's best_model.pth
        analog, consumed by bucketization/synthesis)."""
        path = self.best_dir
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._best.save(path, params)
        self._best.wait_until_finished()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


def load_best_params(exp_path: str, template: Any = None) -> Any:
    """Load the best-params export from an experiment directory."""
    path = (Path(exp_path) / "best").absolute()
    ckpt = ocp.StandardCheckpointer()
    if template is not None:
        return ckpt.restore(path, target=template)
    return ckpt.restore(path)


def save_best_export(exp_path: str, tree: Any) -> str:
    """Write a best-params export (the tree ``load_best_params`` restores)
    into an experiment directory without a CheckpointManager — used by the
    reference-checkpoint importer to materialize experiments from converted
    torch weights."""
    path = (Path(exp_path) / "best").absolute()
    if path.exists():
        import shutil

        shutil.rmtree(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, tree)
    ckpt.wait_until_finished()
    return str(path)
