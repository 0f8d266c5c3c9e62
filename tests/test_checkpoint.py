"""Checkpoint manager: best/last policy, monitor modes, weights-only."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from bflow_tpu.train import TrainState
from bflow_tpu.train.checkpoint import CheckpointManager, restore_weights_only


def make_state(value: float):
    tx = optax.sgd(0.1)
    variables = {
        "params": {"w": jnp.full((4, 4), value)},
        "batch_stats": {"m": jnp.full((4,), value)},
    }
    return TrainState.create(variables, tx), tx


def test_best_last_policy_min_mode(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), "val/epe_multi", "min")
    s1, tx = make_state(1.0)
    info = mgr.save(s1, {"val/epe_multi": 2.0})
    assert info["improved"] and info["best_score"] == 2.0

    s2, _ = make_state(2.0)
    s2 = s2.replace(step=jnp.asarray(5))
    info = mgr.save(s2, {"val/epe_multi": 3.0})  # worse -> best unchanged
    assert not info["improved"] and info["best_score"] == 2.0

    meta = json.loads((tmp_path / "ck" / "meta.json").read_text())
    assert meta["last_step"] == 5

    # 'last' is s2, 'best' is s1
    template, _ = make_state(0.0)
    last = mgr.restore(template.replace(step=jnp.asarray(0)), "last")
    np.testing.assert_array_equal(np.asarray(last.params["w"]), 2.0)
    best = mgr.restore(template, "best")
    np.testing.assert_array_equal(np.asarray(best.params["w"]), 1.0)

    # persistence across manager instances (resume path)
    mgr2 = CheckpointManager(str(tmp_path / "ck"), "val/epe_multi", "min")
    info = mgr2.save(s2, {"val/epe_multi": 1.5})  # better than stored 2.0
    assert info["improved"]
    mgr.close()
    mgr2.close()


def test_weights_only_restore(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), "step", "max")
    s1, _ = make_state(7.0)
    mgr.save(s1, {"step": 1.0})
    mgr.close()

    template = {
        "params": {"w": jnp.zeros((4, 4))},
        "batch_stats": {"m": jnp.zeros((4,))},
    }
    out = restore_weights_only(str(tmp_path / "ck" / "last"), template)
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), 7.0)
    np.testing.assert_array_equal(np.asarray(out["batch_stats"]["m"]), 7.0)
