"""Media logging callback: summary images + Bezier trajectory plots.

Functional counterpart of the reference WandBImageLoggingCallback
(/root/reference/callbacks/logger.py): throttled train-batch summary
strips (event representation, boundary frame, prediction, ground truth,
error heatmap), Bezier trajectory grids, and deterministic subsampling of
validation batches to bound memory. Disabled entirely by
`logging.only_numbers`.
"""

from __future__ import annotations

import random
from typing import Any, Dict, Optional

import numpy as np

from bflow_tpu.callbacks.visualization import (
    ERROR_CLIP,
    bezier_trajectory_figure,
    figure_to_array,
    grad_flow_figure,
    summary_image,
)
from bflow_tpu.data.keys import DataLoading as K


class MediaLogger:
    def __init__(
        self,
        logger,
        dataset: str,
        every_n_steps: int = 5000,
        n_val_predictions: int = 2,
        enabled: bool = True,
    ):
        self.logger = logger  # needs .log_image(key, image, step)
        self.dataset = dataset
        self.every_n_steps = max(1, every_n_steps)
        self.n_val = n_val_predictions
        self.enabled = enabled and hasattr(logger, "log_image")
        self._last_step = -(10**9)
        self._last_grad_step = -(10**9)
        self._val_indices: Optional[set] = None

    def plan_validation(self, n_batches: int) -> None:
        """Deterministically pick which validation batches to render
        (seed-0 sample, reference callbacks/logger.py:288-297) so media
        RAM stays bounded and runs are comparable."""
        n = min(self.n_val, n_batches)
        random.seed(0)
        self._val_indices = set(random.sample(range(n_batches), n))

    def _render(self, batch: Dict[str, Any], pred_flow: np.ndarray, i: int):
        ev = batch.get(K.EV_REPR.value)
        img = batch.get(K.IMG.value)
        flow = np.asarray(batch[K.FLOW.value])
        gt = flow[-1, i] if flow.ndim == 5 else flow[i]
        valid = batch.get(K.FLOW_VALID.value)
        return summary_image(
            pred_flow=np.asarray(pred_flow[i]),
            gt_flow=gt,
            valid=np.asarray(valid[i]) if valid is not None else None,
            ev_repr_sum=np.asarray(ev[i]).sum(-1) if ev is not None else None,
            image=np.asarray(img[0, i]) if img is not None else None,
            error_clip=ERROR_CLIP.get(self.dataset, 3.0),
        )

    def on_train_batch(
        self,
        step: int,
        batch: Dict[str, Any],
        pred_flow,
        bezier_params: Optional[np.ndarray] = None,
    ) -> None:
        if not self.enabled or step - self._last_step < self.every_n_steps:
            return
        self._last_step = step
        strip = self._render(batch, np.asarray(pred_flow), 0)
        self.logger.log_image("train/summary", strip, step)
        if bezier_params is not None and np.asarray(bezier_params).shape[-2] > 1:
            fig = bezier_trajectory_figure(np.asarray(bezier_params)[0])
            self.logger.log_image(
                "train/bezier_trajectories", figure_to_array(fig), step
            )

    def on_validation_batch(
        self,
        step: int,
        batch_idx: int,
        batch: Dict[str, Any],
        pred_flow,
        bezier_params: Optional[np.ndarray] = None,
    ) -> None:
        if not self.enabled:
            return
        if self._val_indices is not None:
            if batch_idx not in self._val_indices:
                return
        elif batch_idx >= self.n_val:  # fallback: first-n
            return
        strip = self._render(batch, np.asarray(pred_flow), 0)
        self.logger.log_image(f"val/summary_{batch_idx}", strip, step)
        if bezier_params is not None and np.asarray(bezier_params).shape[-2] > 1:
            fig = bezier_trajectory_figure(np.asarray(bezier_params)[0])
            self.logger.log_image(
                f"val/bezier_trajectories_{batch_idx}",
                figure_to_array(fig), step,
            )

    def on_after_backward(self, step: int, named_grad_norms) -> None:
        """Gradient-magnitude bar chart at logging cadence (reference
        callbacks/logger.py:129-135). `named_grad_norms` is a dict of
        parameter path -> mean |grad| (see train.step.grad_norm_tree)."""
        if not self.enabled or step - self._last_grad_step < self.every_n_steps:
            return
        self._last_grad_step = step
        items = sorted(
            (k, float(np.asarray(v))) for k, v in named_grad_norms.items()
        )
        fig = grad_flow_figure(items)
        self.logger.log_image("train/gradients", figure_to_array(fig), step)
