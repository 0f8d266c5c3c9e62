"""Training-step throughput on the local TPU (synthetic DSEC batches).

Not the driver benchmark (bench.py is); this measures the jitted
fwd+bwd+AdamW step at the DSEC training crop to track training speed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.data.keys import DataLoading as K
from bflow_tpu.models import RAFTSpline, RaftSplineConfig
from bflow_tpu.train import TaskConfig, TrainState, build_optimizer, make_train_step


def main(batch=3, H=288, W=384, compute_dtype="bfloat16"):
    cfg = RaftSplineConfig(
        nbins_context=15, nbins_correlation=15,
        ev_target_indices=(1, 2, 3, 4), ev_levels=(1, 1, 1, 4),
        use_images=True, corr_precision=compute_dtype,
        compute_dtype=compute_dtype,
    )
    model = RAFTSpline(cfg)
    rng = np.random.default_rng(0)
    batch_data = {
        K.EV_REPR.value: jnp.asarray(
            rng.standard_normal((batch, H, W, cfg.nbins_total)), jnp.float32),
        K.IMG.value: jnp.asarray(
            rng.integers(0, 255, (2, batch, H, W, 3)), jnp.float32),
        K.FLOW.value: jnp.asarray(
            rng.standard_normal((batch, H, W, 2)), jnp.float32),
        K.FLOW_VALID.value: jnp.ones((batch, H, W), bool),
    }
    variables = jax.jit(
        lambda v, i: model.init(jax.random.PRNGKey(0), v, i, train=False)
    )(batch_data[K.EV_REPR.value], batch_data[K.IMG.value])
    tx, _ = build_optimizer({
        "learning_rate": 1e-4, "weight_decay": 1e-4,
        "gradient_clip_val": 1,
        "lr_scheduler": {"use": True, "total_steps": 250000,
                         "pct_start": 0.01},
    })
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, TaskConfig(dataset="dsec"), tx))

    t0 = time.time()
    state, metrics = step(state, batch_data)
    loss = float(metrics["train/l1_seq_loss"][0])
    print(f"compile+first step: {time.time()-t0:.0f}s loss={loss:.3f}")

    KN = 6
    t0 = time.perf_counter()
    for _ in range(KN - 1):
        state, metrics = step(state, batch_data)
    state, metrics = step(state, batch_data)
    loss = float(metrics["train/l1_seq_loss"][0])  # forced readback
    dt = (time.perf_counter() - t0) / KN
    print(f"train step: {dt*1000:.0f} ms -> {batch/dt:.1f} samples/s "
          f"(batch {batch} @ {H}x{W}, {compute_dtype})")


if __name__ == "__main__":
    main()
