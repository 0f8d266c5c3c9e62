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


def resolve_artifact_checkpoint(wandb_cfg: Dict[str, Any], logger) -> Optional[Path]:
    """Resolve `wandb.artifact_name` to a local checkpoint path.

    Mirrors the reference resume flow (/root/reference/train.py:93-106):
    a local path is used directly (our extension — orbax dirs and torch
    .ckpt files); otherwise the artifact is downloaded via the logger
    from `artifact_runpath`, falling back to `wandb_runpath`.
    """
    name = wandb_cfg.get("artifact_name")
    if not name:
        return None
    local = Path(name)
    if local.exists():
        return local
    runpath = wandb_cfg.get("artifact_runpath") or wandb_cfg.get("wandb_runpath")
    if runpath is None:
        print(
            "must specify wandb_runpath or artifact_runpath to restore a "
            "checkpoint/artifact. Cannot load artifact."
        )
        return None
    print(f"resuming checkpoint from runpath {runpath} and artifact {name}")
    downloaded = logger.download_checkpoint(runpath, name)
    if downloaded is None:
        return None
    downloaded = Path(downloaded)
    if downloaded.is_file():
        return downloaded
    # artifact directory: prefer a .ckpt file, else an orbax state dir
    ckpts = sorted(downloaded.glob("**/*.ckpt"))
    if ckpts:
        return ckpts[0]
    subdirs = [p for p in sorted(downloaded.iterdir()) if p.is_dir()]
    return subdirs[0] if subdirs else downloaded


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
