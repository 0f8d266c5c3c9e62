"""Losses and metrics vs independent NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from bflow_tpu.utils.losses import (
    l1_loss_masked,
    l1_multi_seq_loss_masked,
    l1_seq_loss_masked,
)
from bflow_tpu.utils.metrics import (
    MetricBank,
    angular_error,
    epe,
    epe_multi,
    n_pixel_error,
    predictions_from_lin_assumption,
    single_flow_metrics,
)


def np_l1(src, tgt, mask=None):
    per = np.abs(src - tgt).sum(-1)
    if mask is None:
        return per.mean()
    return per[mask].sum() / mask.sum()


def test_l1_loss(rng):
    src = rng.standard_normal((2, 6, 7, 2)).astype(np.float32)
    tgt = rng.standard_normal((2, 6, 7, 2)).astype(np.float32)
    mask = rng.random((2, 6, 7)) > 0.3
    np.testing.assert_allclose(
        float(l1_loss_masked(jnp.asarray(src), jnp.asarray(tgt))),
        np_l1(src, tgt),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(
            l1_loss_masked(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
        ),
        np_l1(src, tgt, mask),
        rtol=1e-5,
    )


def test_seq_loss_gamma_weighting(rng):
    tgt = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    srcs = [rng.standard_normal((1, 4, 4, 2)).astype(np.float32) for _ in range(3)]
    got = float(
        l1_seq_loss_masked([jnp.asarray(s) for s in srcs], jnp.asarray(tgt))
    )
    want = sum(
        0.8 ** (3 - i - 1) * np_l1(srcs[i], tgt) for i in range(3)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_multi_seq_loss(rng):
    tgts = [rng.standard_normal((1, 4, 4, 2)).astype(np.float32) for _ in range(2)]
    srcs = [
        [rng.standard_normal((1, 4, 4, 2)).astype(np.float32) for _ in range(2)]
        for _ in range(3)
    ]
    got = float(
        l1_multi_seq_loss_masked(
            [[jnp.asarray(s) for s in row] for row in srcs],
            [jnp.asarray(t) for t in tgts],
        )
    )
    want = sum(
        0.8 ** (3 - i - 1)
        * np.mean([np_l1(srcs[i][j], tgts[j]) for j in range(2)])
        for i in range(3)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_epe_and_ae(rng):
    src = rng.standard_normal((2, 5, 5, 2)).astype(np.float32)
    tgt = rng.standard_normal((2, 5, 5, 2)).astype(np.float32)
    mask = rng.random((2, 5, 5)) > 0.4

    val, ok = epe(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    want = np.sqrt(((src - tgt) ** 2).sum(-1))[mask].mean()
    np.testing.assert_allclose(float(val), want, rtol=1e-5)
    assert float(ok) == 1.0

    # empty mask -> update marked invalid
    _, ok0 = epe(jnp.asarray(src), jnp.asarray(tgt), jnp.zeros((2, 5, 5), bool))
    assert float(ok0) == 0.0

    val, _ = angular_error(jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(mask))
    ones = np.ones((2, 5, 5, 1), np.float32)
    s = np.concatenate([src, ones], -1)
    t = np.concatenate([tgt, ones], -1)
    cos = np.clip(
        (s * t).sum(-1)
        / (np.linalg.norm(s, axis=-1) * np.linalg.norm(t, axis=-1)),
        -1,
        1,
    )
    want = (np.arccos(cos) / np.pi * 180)[mask].mean()
    np.testing.assert_allclose(float(val), want, rtol=1e-4)


def test_npe(rng):
    src = (5 * rng.standard_normal((1, 8, 8, 2))).astype(np.float32)
    tgt = (5 * rng.standard_normal((1, 8, 8, 2))).astype(np.float32)
    val, _ = n_pixel_error(jnp.asarray(src), jnp.asarray(tgt), None, 3.0)
    err = np.linalg.norm(src - tgt, axis=-1)
    rel = err / np.clip(np.linalg.norm(tgt, axis=-1), 1e-6, None)
    want = ((err > 3.0) & (rel >= 0.05)).mean() * 100
    np.testing.assert_allclose(float(val), want, rtol=1e-5)


def test_epe_multi_with_traj_gating(rng):
    tgts = [rng.standard_normal((1, 6, 6, 2)).astype(np.float32) for _ in range(3)]
    srcs = [rng.standard_normal((1, 6, 6, 2)).astype(np.float32) for _ in range(3)]
    val, ok = epe_multi(
        [jnp.asarray(s) for s in srcs],
        [jnp.asarray(t) for t in tgts],
        min_traj_len=0.5,
    )
    stack = np.stack(tgts)
    traj = np.linalg.norm(stack[1:] - stack[:-1], axis=-1).sum(0)
    gate = traj >= 0.5
    vals = []
    for s, t in zip(srcs, tgts):
        e = np.sqrt(((s - t) ** 2).sum(-1))
        if gate.sum() > 0:
            vals.append(e[gate].mean())
    np.testing.assert_allclose(float(val), np.mean(vals), rtol=1e-5)
    assert float(ok) == 1.0


def test_ae_multi_skips_all_invalid_timestamps(rng):
    """An all-invalid timestamp must be dropped from the ae_multi mean
    (validity weighting, like epe_multi), not averaged in as a garbage
    guarded-denominator angle."""
    from bflow_tpu.utils.metrics import ae_multi

    srcs = [rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
            for _ in range(3)]
    tgts = [rng.standard_normal((1, 5, 5, 2)).astype(np.float32)
            for _ in range(3)]
    masks = [np.ones((1, 5, 5), bool) for _ in range(3)]
    masks[1][:] = False  # timestamp 1 has NO valid pixels

    val, ok = ae_multi(
        [jnp.asarray(s) for s in srcs],
        [jnp.asarray(t) for t in tgts],
        [jnp.asarray(m) for m in masks],
    )
    want = np.mean([
        float(angular_error(jnp.asarray(s), jnp.asarray(t),
                            jnp.asarray(m))[0])
        for i, (s, t, m) in enumerate(zip(srcs, tgts, masks))
        if i != 1
    ])
    np.testing.assert_allclose(float(val), want, rtol=1e-5)
    assert float(ok) == 1.0

    # every timestamp invalid -> the update itself is invalid
    none = [jnp.asarray(np.zeros((1, 5, 5), bool)) for _ in range(3)]
    _, ok = ae_multi(
        [jnp.asarray(s) for s in srcs],
        [jnp.asarray(t) for t in tgts],
        none,
    )
    assert float(ok) == 0.0


def test_lin_assumption_and_bank(rng):
    src = rng.standard_normal((1, 4, 4, 2)).astype(np.float32)
    preds = predictions_from_lin_assumption(jnp.asarray(src), [0.5, 1.0])
    np.testing.assert_allclose(np.asarray(preds[0]), 0.5 * src, rtol=1e-6)

    bank = MetricBank()
    tgt = jnp.asarray(rng.standard_normal((1, 4, 4, 2)).astype(np.float32))
    m1 = single_flow_metrics(jnp.asarray(src), tgt)
    bank.update(m1)
    bank.update(m1)
    out = bank.compute()
    assert set(out) == {"epe", "ae", "1pe", "2pe", "3pe"}
    np.testing.assert_allclose(out["epe"], float(m1["epe"][0]), rtol=1e-6)
    bank.reset()
    assert bank.compute() == {}
