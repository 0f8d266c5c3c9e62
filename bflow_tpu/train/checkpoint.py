"""Orbax checkpointing: async save/restore of the full training state.

Reproduces the reference's checkpoint policy (/root/reference/utils/
general.py:107-134): one monitored "best" checkpoint (DSEC monitors
global_step ascending — effectively keep-latest, since DSEC trains
without validation; MultiFlow monitors val/epe_multi descending) plus a
"last" checkpoint every epoch, and two resume modes — full training
state or weights-only (reference train.py:94-130).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from bflow_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        monitor: str,
        mode: str,  # 'min' | 'max'
    ):
        assert mode in ("min", "max")
        self.directory = Path(directory).resolve()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self._best: Optional[float] = None
        self._ckpt = ocp.StandardCheckpointer()
        self._meta_path = self.directory / "meta.json"
        if self._meta_path.exists():
            meta = json.loads(self._meta_path.read_text())
            self._best = meta.get("best_score")

    def _save(self, name: str, state: TrainState) -> None:
        path = self.directory / name
        self._ckpt.save(path, state, force=True)

    def save(
        self, state: TrainState, metrics: Dict[str, float]
    ) -> Dict[str, Any]:
        """Save 'last' always; refresh 'best' when the monitor improves."""
        self._save("last", state)
        score = metrics.get(self.monitor)
        improved = False
        if score is not None:
            score = float(score)
            if (
                self._best is None
                or (self.mode == "min" and score < self._best)
                or (self.mode == "max" and score > self._best)
            ):
                self._best = score
                self._save("best", state)
                improved = True
        self._ckpt.wait_until_finished()
        self._meta_path.write_text(
            json.dumps(
                {
                    "best_score": self._best,
                    "monitor": self.monitor,
                    "mode": self.mode,
                    "last_step": int(state.step),
                }
            )
        )
        return {"improved": improved, "best_score": self._best}

    def restore(
        self, template: TrainState, which: str = "last"
    ) -> Optional[TrainState]:
        path = self.directory / which
        if not path.exists():
            return None
        return self._ckpt.restore(path, template)

    def close(self):
        self._ckpt.wait_until_finished()


def restore_weights_only(path: str, template_variables: Dict[str, Any]):
    """Weights-only resume from an orbax state dir OR a torch .ckpt."""
    p = Path(path)
    if p.suffix == ".ckpt":
        from bflow_tpu.importer.torch_ckpt import load_torch_checkpoint

        return load_torch_checkpoint(str(p), template_variables)
    ckpt = ocp.StandardCheckpointer()
    # stored as a full TrainState dir; restore untyped then pick the
    # variable subtrees (shapes validated by the caller's first apply)
    state = ckpt.restore(p)
    out = {"params": state["params"]}
    if state.get("batch_stats"):
        out["batch_stats"] = state["batch_stats"]
    return out
