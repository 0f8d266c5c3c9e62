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


def main(batch=3, H=288, W=384, compute_dtype="bfloat16",
         dataset="dsec"):
    if dataset == "multiflow2d":
        # MultiFlow E_I_LU5_BD10 training recipe (368x496 crop),
        # reference batch 3/chip (config/general.yaml:4). The round-3
        # slab volume layout removed the 2.1x lane-padding HBM waste
        # of (hl, 62)-shaped maps that made batch 3 OOM in round 2.
        H, W = 368, 496
        cfg = RaftSplineConfig(
            nbins_context=41, nbins_correlation=25, bezier_degree=10,
            ev_target_indices=(8, 16, 24, 32, 40),
            ev_levels=(1, 1, 1, 1, 4),
            use_images=True, corr_precision=compute_dtype,
            compute_dtype=compute_dtype,
            # 12 unrolled iterations x 6 targets at 368x496 overflow the
            # 16 GB HBM without rematerializing the update block
            remat_updates=True,
        )
    else:
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
    }
    if dataset == "multiflow2d":
        sup_ts = (0.25, 0.5, 0.75, 1.0)
        batch_data[K.FLOW.value] = jnp.asarray(
            rng.standard_normal((batch, len(sup_ts), H, W, 2)).transpose(
                1, 0, 2, 3, 4
            ),
            jnp.float32,
        )
        batch_data[K.FLOW_VALID.value] = jnp.ones(
            (len(sup_ts), batch, H, W), bool
        )
    else:
        sup_ts = None
        batch_data[K.FLOW.value] = jnp.asarray(
            rng.standard_normal((batch, H, W, 2)), jnp.float32)
        batch_data[K.FLOW_VALID.value] = jnp.ones((batch, H, W), bool)
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
    task = (
        TaskConfig(dataset="multiflow2d", multi_loss=True,
                   supervision_timestamps=sup_ts)
        if dataset == "multiflow2d"
        else TaskConfig(dataset="dsec")
    )
    step = jax.jit(make_train_step(model, task, tx))

    t0 = time.time()
    state, metrics = step(state, batch_data)
    loss_key = next(k for k in metrics if k.endswith("loss"))
    loss = float(metrics[loss_key][0])
    print(f"compile+first step: {time.time()-t0:.0f}s loss={loss:.3f}")

    KN = 6
    t0 = time.perf_counter()
    for _ in range(KN - 1):
        state, metrics = step(state, batch_data)
    state, metrics = step(state, batch_data)
    loss = float(metrics[loss_key][0])  # forced readback
    dt = (time.perf_counter() - t0) / KN
    print(f"train step [{dataset}]: {dt*1000:.0f} ms -> "
          f"{batch/dt:.1f} samples/s "
          f"(batch {batch} @ {H}x{W}, {compute_dtype})")


if __name__ == "__main__":
    ds = sys.argv[1] if len(sys.argv) > 1 else "dsec"
    kw = {}
    if len(sys.argv) > 2:
        kw["batch"] = int(sys.argv[2])
    main(dataset=ds, **kw)
