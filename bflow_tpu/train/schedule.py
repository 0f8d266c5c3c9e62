"""Learning-rate schedules.

`onecycle_linear_schedule` replicates torch's OneCycleLR with
anneal_strategy='linear' and three_phase=False *exactly*, including the
reference's quirky `total_steps + 100` horizon and the -1 step offsets in
torch's phase boundaries (torch.optim.lr_scheduler.OneCycleLR), so that
training curves are step-for-step comparable. Used via
/root/reference/modules/raft_spline.py:334-340 semantics.
"""

from __future__ import annotations

import jax.numpy as jnp


def onecycle_linear_schedule(
    max_lr: float,
    total_steps: int,
    pct_start: float = 0.01,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
):
    """Two-phase linear one-cycle schedule (torch-exact).

    Phase 1: steps [0, up_end]   lr: max_lr/div -> max_lr
    Phase 2: steps (up_end, T-1] lr: max_lr -> (max_lr/div)/final_div
    """
    initial_lr = max_lr / div_factor
    min_lr = initial_lr / final_div_factor
    up_end = float(pct_start * total_steps) - 1.0
    down_end = float(total_steps) - 1.0

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        pct_up = jnp.clip(step / jnp.maximum(up_end, 1e-8), 0.0, 1.0)
        lr_up = initial_lr + (max_lr - initial_lr) * pct_up
        pct_down = jnp.clip(
            (step - up_end) / jnp.maximum(down_end - up_end, 1e-8), 0.0, 1.0
        )
        lr_down = max_lr + (min_lr - max_lr) * pct_down
        return jnp.where(step <= up_end, lr_up, lr_down)

    return schedule
