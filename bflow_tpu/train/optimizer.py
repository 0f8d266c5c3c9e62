"""Optimizer assembly: element-wise gradient clamp + AdamW + OneCycle.

Matches the reference recipe (/root/reference/train.py:139-142,
/root/reference/modules/raft_spline.py:321-340): per-element gradient
*clamping* to +/- clip (torch hooks use clamp, not norm clipping — a
semantic preserved here via optax.clip), AdamW with torch defaults, and
the linear one-cycle schedule over total_steps + 100.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import optax

from bflow_tpu.train.schedule import onecycle_linear_schedule


def build_optimizer(
    training_cfg: Dict[str, Any],
) -> Tuple[optax.GradientTransformation, Any]:
    """Build from the `training:` config group. Returns (tx, schedule)."""
    lr = float(training_cfg["learning_rate"])
    wd = float(training_cfg["weight_decay"])
    clip = training_cfg.get("gradient_clip_val")

    sched_cfg = training_cfg.get("lr_scheduler") or {}
    schedule: Any
    if sched_cfg.get("use", False):
        total = int(sched_cfg["total_steps"])
        schedule = onecycle_linear_schedule(
            max_lr=lr,
            total_steps=total + 100,  # reference adds 100 steps of slack
            pct_start=float(sched_cfg.get("pct_start", 0.01)),
        )
    else:
        schedule = lr

    parts = []
    if clip is not None and float(clip) > 0:
        parts.append(optax.clip(float(clip)))
    parts.append(
        optax.adamw(schedule, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    )
    return optax.chain(*parts), schedule
