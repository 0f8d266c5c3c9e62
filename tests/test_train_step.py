"""Train/eval steps + schedule + data-parallel mesh on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch

from bflow_tpu.data.keys import DataLoading as K
from bflow_tpu.models import RAFTSpline, RaftSplineConfig
from bflow_tpu.parallel import make_mesh, replicate, shard_batch
from bflow_tpu.train import (
    TaskConfig,
    TrainState,
    build_optimizer,
    make_eval_step,
    make_train_step,
    onecycle_linear_schedule,
)

SMALL = RaftSplineConfig(
    nbins_context=5,
    nbins_correlation=5,
    ev_target_indices=(1, 2, 3, 4),
    ev_levels=(1, 1, 1, 2),
    use_images=True,
    iters_train=2,
    iters_test=2,
)


def test_onecycle_matches_torch():
    max_lr, total, pct = 1e-4, 500, 0.01
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=max_lr)
    sched = torch.optim.lr_scheduler.OneCycleLR(
        opt, max_lr=max_lr, total_steps=total, pct_start=pct,
        cycle_momentum=False, anneal_strategy="linear",
    )
    ours = onecycle_linear_schedule(max_lr, total, pct)
    torch_lrs, our_lrs = [], []
    for step in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        our_lrs.append(float(ours(step)))
        opt.step()
        sched.step()
    # fp32 schedule arithmetic: tiny absolute slack for the ~4e-10 tail
    np.testing.assert_allclose(our_lrs, torch_lrs, rtol=1e-5, atol=1e-12)


def _dsec_batch(rng, n=2, h=32, w=32, nbins=9):
    return {
        K.EV_REPR.value: rng.standard_normal((n, h, w, nbins)).astype(np.float32),
        K.IMG.value: rng.integers(0, 255, (2, n, h, w, 3)).astype(np.float32),
        K.FLOW.value: rng.standard_normal((n, h, w, 2)).astype(np.float32),
        K.FLOW_VALID.value: np.ones((n, h, w), bool),
    }


@pytest.fixture(scope="module")
def dsec_setup():
    rng = np.random.default_rng(0)
    model = RAFTSpline(SMALL)
    batch = _dsec_batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch[K.EV_REPR.value]),
        jnp.asarray(batch[K.IMG.value]),
    )
    tx, _ = build_optimizer(
        {"learning_rate": 1e-4, "weight_decay": 1e-4, "gradient_clip_val": 1,
         "lr_scheduler": {"use": False}}
    )
    return model, variables, tx, batch


def test_train_step_reduces_loss(dsec_setup):
    model, variables, tx, batch = dsec_setup
    task = TaskConfig(dataset="dsec")
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, task, tx))
    losses = []
    for _ in range(4):
        state, metrics = step(state, batch)
        losses.append(float(metrics["train/l1_seq_loss"][0]))
    assert int(state.step) == 4
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # same batch: must overfit downward
    # batch stats must have moved (cnet batchnorm in train mode)
    bs0 = jax.tree_util.tree_leaves(variables["batch_stats"])[0]
    bs1 = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.allclose(np.asarray(bs0), np.asarray(bs1))


def test_eval_step_metrics(dsec_setup):
    model, variables, tx, batch = dsec_setup
    task = TaskConfig(dataset="dsec")
    eval_step = jax.jit(make_eval_step(model, task))
    metrics, pred, bez_low = eval_step(variables, batch)
    assert pred.shape == (2, 32, 32, 2)
    assert bez_low.shape == (2, 4, 4, SMALL.bezier_degree, 2)
    assert set(metrics) == {"val/epe", "val/ae", "val/1pe", "val/2pe", "val/3pe"}
    assert np.isfinite(float(metrics["val/epe"][0]))


def test_eval_step_pads_non_x8_inputs(dsec_setup):
    """478x39-ish inputs must be padded for inference and unpadded back
    (reference modules/raft_spline.py:216-221, with the requires_padding
    bug fixed)."""
    model, variables, tx, _ = dsec_setup
    task = TaskConfig(dataset="dsec")
    rng = np.random.default_rng(3)
    n, h, w = 1, 30, 39  # not divisible by 8
    batch = {
        K.EV_REPR.value: rng.standard_normal((n, h, w, 9)).astype(np.float32),
        K.IMG.value: rng.integers(0, 255, (2, n, h, w, 3)).astype(np.float32),
        K.FLOW.value: rng.standard_normal((n, h, w, 2)).astype(np.float32),
        K.FLOW_VALID.value: np.ones((n, h, w), bool),
    }
    eval_step = jax.jit(make_eval_step(model, task))
    metrics, pred, _ = eval_step(variables, batch)
    assert pred.shape == (n, h, w, 2)
    assert np.isfinite(float(metrics["val/epe"][0]))


def test_train_step_grad_norms(dsec_setup):
    model, variables, tx, batch = dsec_setup
    task = TaskConfig(dataset="dsec")
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, task, tx, with_grad_norms=True))
    state, metrics, norms = step(state, batch)
    assert norms, "expected per-parameter grad norms"
    vals = [float(np.asarray(v)) for v in norms.values()]
    assert all(np.isfinite(vals))
    assert any(v > 0 for v in vals)
    assert any("update_block" in k for k in norms)


def test_multiflow_train_step(rng):
    cfg = RaftSplineConfig(
        nbins_context=11, nbins_correlation=7, bezier_degree=4,
        ev_target_indices=(2, 4, 6, 8, 10), ev_levels=(1, 1, 1, 1, 2),
        use_images=False, iters_train=2, iters_test=2,
    )
    model = RAFTSpline(cfg)
    ts = (0.25, 0.5, 0.75, 1.0)
    n, h, w = 2, 32, 32
    batch = {
        K.EV_REPR.value: rng.standard_normal((n, h, w, cfg.nbins_total)).astype(np.float32),
        K.FLOW.value: rng.standard_normal((len(ts), n, h, w, 2)).astype(np.float32),
    }
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch[K.EV_REPR.value]), None
    )
    tx, _ = build_optimizer(
        {"learning_rate": 1e-4, "weight_decay": 1e-4, "gradient_clip_val": 1,
         "lr_scheduler": {"use": False}}
    )
    task = TaskConfig(
        dataset="multiflow2d", multi_loss=True, supervision_timestamps=ts
    )
    state = TrainState.create(variables, tx)
    step = jax.jit(make_train_step(model, task, tx))
    state, metrics = step(state, batch)
    for key in ("train/l1_multi_seq_loss", "train/epe_multi",
                "train/epe_multi_lin", "train/ae_multi"):
        assert np.isfinite(float(metrics[key][0])), key


def test_data_parallel_step_on_8_devices(dsec_setup):
    model, variables, tx, _ = dsec_setup
    assert jax.device_count() >= 8
    mesh = make_mesh(n_devices=8)
    rng = np.random.default_rng(1)
    batch = shard_batch(_dsec_batch(rng, n=8), mesh)
    task = TaskConfig(dataset="dsec")
    state = jax.device_put(TrainState.create(variables, tx), replicate(mesh))
    step = jax.jit(make_train_step(model, task, tx))
    with mesh:
        state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["train/l1_seq_loss"][0]))
    assert int(state.step) == 1

    # sharded-vs-single-device equivalence of the loss on the same batch
    state1 = TrainState.create(variables, tx)
    unsharded = {k: jnp.asarray(np.asarray(v)) for k, v in batch.items()}
    _, metrics1 = jax.jit(make_train_step(model, task, tx))(state1, unsharded)
    np.testing.assert_allclose(
        float(metrics["train/l1_seq_loss"][0]),
        float(metrics1["train/l1_seq_loss"][0]),
        rtol=2e-4,
    )


def test_remat_updates_matches_plain(rng):
    """remat_updates must not change values or gradients, only memory."""
    import dataclasses

    base = dataclasses.replace(SMALL, use_images=False, iters_train=2)
    remat = dataclasses.replace(base, remat_updates=True)
    n, h, w = 1, 32, 32
    vox = jnp.asarray(
        rng.standard_normal((n, h, w, base.nbins_total)), jnp.float32
    )
    m0, m1 = RAFTSpline(base), RAFTSpline(remat)
    variables = m0.init(jax.random.PRNGKey(0), vox, None)

    def loss(model, params):
        v = {"params": params, "batch_stats": variables["batch_stats"]}
        preds, _ = model.apply(v, vox, None, train=True,
                               mutable=["batch_stats"])
        return preds[-1].flow_at(1.0).sum()

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
