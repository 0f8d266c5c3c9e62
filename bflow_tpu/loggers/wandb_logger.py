"""Weights & Biases logger with artifact-based checkpoint mirroring.

API-parity re-design of the reference logger (/root/reference/loggers/
wandb_logger.py): stable run ids with resume="allow", global-step x-axis,
checkpoint upload as versioned artifacts with score metadata and
best/last aliases, remote top-k garbage collection, and artifact download
for resume. Gated on wandb being importable AND configured — the
framework runs fully without it (this environment has no wandb and no
egress, so the class degrades to a no-op and says so once).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional

try:
    import wandb  # type: ignore

    _HAS_WANDB = True
except ImportError:
    wandb = None
    _HAS_WANDB = False


class WandbLogger:
    def __init__(
        self,
        project: str,
        group: Optional[str] = None,
        run_id: Optional[str] = None,
        log_model: bool = True,
        config: Optional[Dict[str, Any]] = None,
        top_k: int = 1,
    ):
        self.enabled = _HAS_WANDB
        self.log_model = log_model
        self.top_k = top_k
        self._run = None
        if not self.enabled:
            print("wandb not available — W&B logging disabled")
            return
        self._run = wandb.init(
            project=project,
            group=group,
            id=run_id,
            resume="allow",
            config=config,
        )
        # make the trainer step the universal x-axis
        self._run.define_metric("trainer/global_step")
        self._run.define_metric(
            "*", step_metric="trainer/global_step", step_sync=True
        )

    @property
    def run_id(self) -> Optional[str]:
        return self._run.id if self._run else None

    def log(self, metrics: Dict[str, float], step: int) -> None:
        if not self.enabled:
            return
        self._run.log(
            {**metrics, "trainer/global_step": step}, commit=True
        )

    def log_image(self, key: str, image, step: int, caption: str = "") -> None:
        if not self.enabled:
            return
        self._run.log(
            {key: wandb.Image(image, caption=caption),
             "trainer/global_step": step},
        )

    def log_histograms(
        self, tree: Any, step: int, prefix: str = "parameters"
    ) -> None:
        """Histogram every leaf of a param/grad pytree — the functional
        equivalent of the reference's `logger.watch(net, log='all')`
        (/root/reference/train.py:137, loggers/wandb_logger.py:126-127)."""
        if not self.enabled:
            return
        import jax
        import numpy as np

        payload: Dict[str, Any] = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(
                str(getattr(p, "key", getattr(p, "idx", p))) for p in path
            )
            payload[f"{prefix}/{name}"] = wandb.Histogram(
                np.asarray(leaf).ravel()
            )
        self._run.log({**payload, "trainer/global_step": step})

    # -- checkpoint artifacts -------------------------------------------------

    def upload_checkpoint(
        self,
        ckpt_dir: str,
        step: int,
        score: Optional[float] = None,
        aliases: Optional[list] = None,
    ) -> None:
        if not (self.enabled and self.log_model):
            return
        art = wandb.Artifact(
            name=f"checkpoint-{self._run.id}",
            type="model",
            metadata={"step": step, "score": score},
        )
        art.add_dir(str(ckpt_dir))
        self._run.log_artifact(art, aliases=aliases or ["last"])
        self._gc_artifacts()

    def _gc_artifacts(self) -> None:
        """Delete remote checkpoint versions beyond top-k (+aliases)."""
        if not self.enabled:
            return
        try:
            api = wandb.Api()
            versions = api.artifact_versions(
                "model", f"{self._run.entity}/{self._run.project}/"
                f"checkpoint-{self._run.id}"
            )
            scored = [v for v in versions if not v.aliases]
            for v in scored[self.top_k:]:
                v.delete()
        except Exception:
            pass  # GC is best-effort

    def download_checkpoint(
        self, artifact_runpath: str, artifact_name: str
    ) -> Optional[Path]:
        if not self.enabled:
            return None
        api = wandb.Api()
        art = api.artifact(f"{artifact_runpath}/{artifact_name}")
        return Path(art.download())

    def finalize(self) -> None:
        if self._run is not None:
            self._run.finish()
