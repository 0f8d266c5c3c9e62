"""Jittable train / eval steps for both dataset families.

One fused XLA graph per step: forward (12 unrolled refinement
iterations), loss over all iterations, backward, elementwise gradient
clamp, AdamW update, and metric reductions. Under a data-parallel mesh
the batch arrives sharded along 'data'; gradient and metric psums are
inserted by the compiler from the sharding alone.

Loss/metric branching per dataset family mirrors the reference
LightningModule (/root/reference/modules/raft_spline.py:87-175,207-306),
with the MultiFlow supervision timestamps static (they are fixed by the
dataset recipe, and the reference asserts they're batch-constant).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from bflow_tpu.data.keys import DataLoading as K
from bflow_tpu.models.raft_spline import RAFTSpline
from bflow_tpu.train.state import TrainState
from bflow_tpu.utils import metrics as M
from bflow_tpu.utils.losses import (
    l1_multi_seq_loss_masked,
    l1_seq_loss_masked,
)


@dataclass(frozen=True)
class TaskConfig:
    """Static supervision recipe (hashable, closed over by jit)."""

    dataset: str  # 'dsec' | 'multiflow2d'
    multi_loss: bool = False
    # MultiFlow ground-truth supervision timestamps, normalized to [0, 1].
    supervision_timestamps: Tuple[float, ...] = ()
    gamma: float = 0.8

    def __post_init__(self):
        assert self.dataset in ("dsec", "multiflow2d")
        if self.dataset == "multiflow2d":
            assert len(self.supervision_timestamps) > 0


def _unpack(batch: Dict[str, Any], use_images: bool):
    voxel = batch.get(K.EV_REPR.value)
    images = batch.get(K.IMG.value) if use_images else None
    flow = batch[K.FLOW.value]
    valid = batch.get(K.FLOW_VALID.value)
    return voxel, images, flow, valid


def grad_norm_tree(grads) -> Dict[str, jax.Array]:
    """Mean |grad| per parameter leaf, keyed by a '/'-joined path — the
    payload of the reference's gradient-magnitude figure
    (/root/reference/callbacks/logger.py:129-135)."""
    out: Dict[str, jax.Array] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(grads)[0]:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out[name] = jnp.mean(jnp.abs(leaf)).astype(jnp.float32)
    return out


def make_train_step(
    model: RAFTSpline, task: TaskConfig, tx, with_grad_norms: bool = False
):
    cfg = model.config

    def loss_fn(params, batch_stats, batch):
        voxel, images, flow, valid = _unpack(batch, cfg.use_images)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        preds, mutated = model.apply(
            variables,
            voxel,
            images,
            iters=cfg.iters_train,
            train=True,
            mutable=["batch_stats"],
        )

        metrics: Dict[str, M.MetricUpdate] = {}
        if task.dataset == "dsec":
            flows = [p.flow_at(1.0) for p in preds]
            loss = l1_seq_loss_masked(flows, flow, valid, task.gamma)
            metrics["train/l1_seq_loss"] = (loss, jnp.float32(1.0))
            for k, v in M.single_flow_metrics(flows[-1], flow, valid).items():
                metrics[f"train/{k}"] = v
        else:
            ts = task.supervision_timestamps
            # flow: (M, N, H, W, 2) stacked over supervision timestamps
            targets = [flow[i] for i in range(len(ts))]
            flows_it = [[p.flow_at(t) for t in ts] for p in preds]
            if task.multi_loss:
                loss = l1_multi_seq_loss_masked(
                    flows_it, targets, None, task.gamma
                )
                metrics["train/l1_multi_seq_loss"] = (loss, jnp.float32(1.0))
            else:
                loss = l1_seq_loss_masked(
                    [row[-1] for row in flows_it], targets[-1], None, task.gamma
                )
                metrics["train/l1_seq_loss"] = (loss, jnp.float32(1.0))
            final = flows_it[-1]
            for k, v in M.single_flow_metrics(final[-1], targets[-1]).items():
                metrics[f"train/{k}"] = v
            metrics["train/epe_multi"] = M.epe_multi(final, targets)
            metrics["train/ae_multi"] = M.ae_multi(final, targets)
            lin = M.predictions_from_lin_assumption(final[-1], ts)
            metrics["train/epe_multi_lin"] = M.epe_multi(lin, targets)
            metrics["train/ae_multi_lin"] = M.ae_multi(lin, targets)

        return loss, (mutated.get("batch_stats", {}), metrics)

    def train_step(state: TrainState, batch, metric_acc=None):
        """One fused step. When `metric_acc` (from `init_metric_acc`) is
        given, per-metric (weighted sum, weight) accumulate ON DEVICE and
        are returned in its place — the host loop then reads metrics back
        only at logging cadence instead of synchronizing every step
        (a per-step readback serializes the dispatch pipeline)."""
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_bs, metrics)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        norms = grad_norm_tree(grads) if with_grad_norms else None
        if metric_acc is None:
            return (
                (new_state, metrics, norms)
                if with_grad_norms
                else (new_state, metrics)
            )
        new_acc = {
            k: (
                metric_acc[k][0] + metrics[k][0] * metrics[k][1],
                metric_acc[k][1] + metrics[k][1],
            )
            for k in metrics
        }
        if with_grad_norms:
            return new_state, new_acc, norms
        return new_state, new_acc

    return train_step


def train_metric_keys(task: TaskConfig) -> Tuple[str, ...]:
    """The exact metric keys a train step emits — static per task, so the
    accumulator can be built before the first step (one compiled graph)."""
    singles = ("epe", "ae", "1pe", "2pe", "3pe")
    if task.dataset == "dsec":
        return ("train/l1_seq_loss",) + tuple(f"train/{k}" for k in singles)
    loss = (
        "train/l1_multi_seq_loss" if task.multi_loss else "train/l1_seq_loss"
    )
    return (
        (loss,)
        + tuple(f"train/{k}" for k in singles)
        + (
            "train/epe_multi",
            "train/ae_multi",
            "train/epe_multi_lin",
            "train/ae_multi_lin",
        )
    )


def init_metric_acc(metrics_template) -> Dict[str, Tuple]:
    """Zeroed on-device accumulator from a metrics dict OR a key tuple."""
    return {
        k: (jnp.float32(0.0), jnp.float32(0.0)) for k in metrics_template
    }


def metric_acc_means(metric_acc) -> Dict[str, float]:
    """One batched host readback -> mean per metric (skips empty)."""
    import numpy as np

    host = jax.device_get(metric_acc)
    out = {}
    for k, (total, weight) in host.items():
        w = float(np.asarray(weight))
        if w > 0:
            out[k] = float(np.asarray(total)) / w
    return out


def make_eval_step(model: RAFTSpline, task: TaskConfig):
    cfg = model.config

    def eval_step(variables, batch):
        from bflow_tpu.ops.bezier import BezierCurves
        from bflow_tpu.utils.padder import InputPadder

        voxel, images, flow, valid = _unpack(batch, cfg.use_images)
        # pad non-x8 inputs for inference, unpad the prediction — the
        # reference intends this in validation_step but its
        # requires_padding bug keeps the path dead
        # (/root/reference/modules/raft_spline.py:216-221). Shapes are
        # static under jit, so the branch resolves at trace time.
        ref = voxel if voxel is not None else images[0]
        H, W = ref.shape[-3], ref.shape[-2]
        padder = InputPadder()
        if padder.requires_padding(H, W):
            if voxel is not None:
                voxel = padder.pad(voxel)
            if images is not None:
                images = padder.pad(images)
        bezier_low, bezier_up = model.apply(
            variables, voxel, images, iters=cfg.iters_test,
            test_mode=True, train=False,
        )
        if padder.requires_padding(H, W):
            # bezier params are (N, Hp, Wp, P, 2): unpad the spatial axes
            up = padder.unpad(
                bezier_up.params.reshape(*bezier_up.params.shape[:3], -1),
                H, W,
            )
            bezier_up = BezierCurves(
                up.reshape(*up.shape[:3], *bezier_up.params.shape[3:])
            )

        metrics: Dict[str, M.MetricUpdate] = {}
        if task.dataset == "dsec":
            pred = bezier_up.flow_at(1.0)
            for k, v in M.single_flow_metrics(pred, flow, valid).items():
                metrics[f"val/{k}"] = v
            prediction = pred
        else:
            ts = task.supervision_timestamps
            targets = [flow[i] for i in range(len(ts))]
            preds = [bezier_up.flow_at(t) for t in ts]
            for k, v in M.single_flow_metrics(preds[-1], targets[-1]).items():
                metrics[f"val/{k}"] = v
            metrics["val/epe_multi"] = M.epe_multi(preds, targets)
            metrics["val/ae_multi"] = M.ae_multi(preds, targets)
            lin = M.predictions_from_lin_assumption(preds[-1], ts)
            metrics["val/epe_multi_lin"] = M.epe_multi(lin, targets)
            metrics["val/ae_multi_lin"] = M.ae_multi(lin, targets)
            prediction = preds[-1]

        return metrics, prediction, bezier_low.params

    return eval_step
