"""Shape-golden tests for RAFTSpline (DSEC and MultiFlow configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bflow_tpu.models import RAFTSpline, RaftSplineConfig
from bflow_tpu.ops import BezierCurves

DSEC_SMALL = RaftSplineConfig(
    nbins_context=5,
    nbins_correlation=5,
    bezier_degree=2,
    use_events=True,
    use_images=True,
    ev_target_indices=(1, 2, 3, 4),
    ev_levels=(1, 1, 1, 4),
    iters_train=3,
    iters_test=3,
)

MULTIFLOW_SMALL = RaftSplineConfig(
    nbins_context=11,
    nbins_correlation=7,
    bezier_degree=10,
    use_events=True,
    use_images=False,
    ev_target_indices=(2, 4, 6, 8, 10),
    ev_levels=(1, 1, 1, 1, 2),
    iters_train=2,
    iters_test=2,
)


def make_inputs(cfg, N=1, H=64, W=64, rng=None):
    rng = rng or np.random.default_rng(0)
    voxel = jnp.asarray(
        rng.standard_normal((N, H, W, cfg.nbins_total)), jnp.float32
    )
    images = (
        jnp.asarray(rng.integers(0, 255, (2, N, H, W, 3)), jnp.float32)
        if cfg.use_images
        else None
    )
    return voxel, images


def test_corr_planes_dsec_config():
    # DSEC events+images E_I_LU4_BD2: (1+1+1+4)*81 + 4*81 = 891
    assert DSEC_SMALL.corr_planes == 891
    # MultiFlow E_I_LU5_BD10: (1+1+1+1+4)*81 + 4*81 = 972
    mf = RaftSplineConfig(
        nbins_context=41,
        nbins_correlation=25,
        bezier_degree=10,
        ev_target_indices=(8, 16, 24, 32, 40),
        ev_levels=(1, 1, 1, 1, 4),
    )
    assert mf.corr_planes == 972
    # frames always add their own t=1 target (reference raft.py:176-177)
    np.testing.assert_allclose(
        mf.lookup_timestamps, (0.2, 0.4, 0.6, 0.8, 1.0, 1.0), rtol=1e-12
    )


def test_dsec_forward_shapes(rng):
    cfg = DSEC_SMALL
    N, H, W = 1, 64, 64
    voxel, images = make_inputs(cfg, N, H, W, rng)
    model = RAFTSpline(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), voxel, images, test_mode=True, train=False
    )
    assert "batch_stats" in variables  # cnet uses batch norm

    # test mode: (low-res final, upsampled final)
    low, up = model.apply(variables, voxel, images, test_mode=True)
    assert isinstance(low, BezierCurves) and isinstance(up, BezierCurves)
    assert low.params.shape == (N, H // 8, W // 8, cfg.bezier_degree, 2)
    assert up.params.shape == (N, H, W, cfg.bezier_degree, 2)

    flow = up.flow_at(1.0)
    assert flow.shape == (N, H, W, 2)
    assert bool(jnp.isfinite(flow).all())


def test_dsec_train_mode_predictions(rng):
    cfg = DSEC_SMALL
    N, H, W = 2, 32, 48
    voxel, images = make_inputs(cfg, N, H, W, rng)
    model = RAFTSpline(cfg)
    variables = model.init(jax.random.PRNGKey(0), voxel, images, train=False)

    preds, mutated = model.apply(
        variables, voxel, images, train=True, mutable=["batch_stats"]
    )
    assert len(preds) == cfg.iters_train
    for p in preds:
        assert p.params.shape == (N, H, W, cfg.bezier_degree, 2)
    assert "batch_stats" in mutated


def test_multiflow_events_only(rng):
    cfg = MULTIFLOW_SMALL
    N, H, W = 1, 32, 32
    voxel, _ = make_inputs(cfg, N, H, W, rng)
    model = RAFTSpline(cfg)
    variables = model.init(jax.random.PRNGKey(0), voxel, None, test_mode=True)
    low, up = model.apply(variables, voxel, None, test_mode=True)
    assert up.params.shape == (N, H, W, 10, 2)
    # continuous-time queries across the window
    flows = up.flow_at([0.1, 0.37, 0.9])
    assert flows.shape == (3, N, H, W, 2)


def test_param_shapes_match_reference_dims(rng):
    cfg = DSEC_SMALL
    voxel, images = make_inputs(cfg, 1, 32, 32, rng)
    model = RAFTSpline(cfg)
    variables = model.init(jax.random.PRNGKey(0), voxel, images)
    params = variables["params"]

    # motion encoder 1x1 conv over the 891 corr planes
    assert params["update_block"]["encoder"]["convc1"]["kernel"].shape == (
        1, 1, 891, 256,
    )
    # fnet_ev stem takes nbins_correlation channels, cnet takes ctx+3
    assert params["fnet_ev"]["conv1"]["kernel"].shape == (7, 7, 5, 64)
    assert params["cnet"]["conv1"]["kernel"].shape == (7, 7, 8, 64)
    # mask head emits 576 logits
    assert params["update_block"]["mask_2"]["kernel"].shape == (1, 1, 256, 576)
    # bezier head emits 2*degree
    assert params["update_block"]["bezier_head"]["conv2"]["kernel"].shape == (
        3, 3, 256, 4,
    )


def test_flow_init_carries_through(rng):
    cfg = MULTIFLOW_SMALL
    N, H, W = 1, 32, 32
    voxel, _ = make_inputs(cfg, N, H, W, rng)
    model = RAFTSpline(cfg)
    variables = model.init(jax.random.PRNGKey(0), voxel, None, test_mode=True)

    init = BezierCurves(
        jnp.ones((N, H // 8, W // 8, cfg.bezier_degree, 2)) * 3.0
    )
    low_a, _ = model.apply(variables, voxel, None, test_mode=True)
    low_b, _ = model.apply(
        variables, voxel, None, flow_init=init, test_mode=True
    )
    # warm start must change the trajectory
    assert not np.allclose(np.asarray(low_a.params), np.asarray(low_b.params))


@pytest.mark.slow  # interpret-mode kernels are slow (minutes)
def test_pallas_paths_in_model_interpret(rng, monkeypatch):
    """The PRODUCTION lookup paths (pallas slab kernel, and pallas_q8 +
    fuse_corr_conv composed) through the full model, on CPU via the
    interpret-mode escape hatch (corr._INTERPRET). Guards the
    integration seams the unit tests can't see: slab/tuple plumbing
    through the pyramid, q8 gating per level, bf16 lookup outputs
    through the fused einsum. Shapes chosen so level 0 clears the
    hp >= 32 quantization gate."""
    import dataclasses

    from bflow_tpu.models import corr as corr_mod

    monkeypatch.setattr(corr_mod, "_INTERPRET", True)

    cfg = dataclasses.replace(
        DSEC_SMALL, iters_train=2, iters_test=2, detach_bezier=True,
        lookup_method="gather",
    )
    voxel, images = make_inputs(cfg, H=160, W=160,
                                rng=np.random.default_rng(11))
    model = RAFTSpline(cfg)
    variables = model.init(jax.random.PRNGKey(0), voxel, images,
                           test_mode=True)
    head = variables["params"]["update_block"]["bezier_head"]["conv2"]
    head["kernel"] = head["kernel"] * 0.02

    def flow(method, fuse=False, precision="float32"):
        c = dataclasses.replace(
            cfg, lookup_method=method, fuse_corr_conv=fuse,
            corr_precision=precision, compute_dtype=precision,
        )
        _, up = RAFTSpline(c).apply(variables, voxel, images,
                                    test_mode=True)
        return np.asarray(up.flow_at(1.0), np.float32)

    want = flow("gather")
    got = flow("pallas")
    mag = max(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / mag < 1e-3, (
        np.abs(got - want).max(), mag)

    # q8 + fused convc1, bf16 fast mode vs the bf16 gather baseline:
    # int8 + bf16 rounding through a damped 2-iter recurrence
    want16 = flow("gather", precision="bfloat16")
    got16 = flow("pallas_q8", fuse=True, precision="bfloat16")
    mag16 = max(np.abs(want16).max(), 1e-6)
    assert np.isfinite(got16).all()
    assert np.abs(got16 - want16).max() / mag16 < 5e-2, (
        np.abs(got16 - want16).max(), mag16)


@pytest.mark.slow  # two full fwd+bwd model runs (~2 min)
def test_fuse_corr_conv_matches_concat(rng):
    """fuse_corr_conv=True contracts convc1 against the per-level
    lookup outputs instead of the materialized concat — algebraically
    identical; outputs match to f32 accumulation-order round-off
    amplified by the recurrence. Gradients compared against the global
    gradient scale (see test_scan_iters_matches_unrolled)."""
    import dataclasses

    cfg_c = dataclasses.replace(DSEC_SMALL, detach_bezier=True)
    cfg_f = dataclasses.replace(cfg_c, fuse_corr_conv=True)
    voxel, images = make_inputs(cfg_c, rng=np.random.default_rng(9))

    m_c, m_f = RAFTSpline(cfg_c), RAFTSpline(cfg_f)
    variables = m_c.init(jax.random.PRNGKey(0), voxel, images,
                         test_mode=True)
    head = variables["params"]["update_block"]["bezier_head"]["conv2"]
    head["kernel"] = head["kernel"] * 0.02

    def close(a, b, tol):
        a, b = np.asarray(a), np.asarray(b)
        den = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max()
        assert err < tol * den, (err, den)

    bz_c, up_c = m_c.apply(variables, voxel, images, test_mode=True)
    bz_f, up_f = m_f.apply(variables, voxel, images, test_mode=True)
    close(bz_f.params, bz_c.params, 1e-5)
    close(up_f.params, up_c.params, 1e-5)

    def loss(m):
        def f(vs, v, im):
            preds = m.apply(vs, v, im)
            return sum(
                0.8 ** (len(preds) - 1 - i) * jnp.abs(p.params).mean()
                for i, p in enumerate(preds)
            )
        return f

    l_c, g_c = jax.value_and_grad(loss(m_c))(variables, voxel, images)
    l_f, g_f = jax.value_and_grad(loss(m_f))(variables, voxel, images)
    np.testing.assert_allclose(float(l_f), float(l_c), rtol=1e-5)
    flat_c = jax.tree_util.tree_leaves(g_c)
    flat_f = jax.tree_util.tree_leaves(g_f)
    gscale = max(float(np.abs(np.asarray(b)).max()) for b in flat_c)
    for a, b in zip(flat_f, flat_c):
        err = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert err < 1e-3 * gscale, (err, gscale)


@pytest.mark.slow  # two full fwd+bwd model runs (~2 min)
def test_scan_iters_matches_unrolled(rng):
    """scan_iters=True is a compile-time knob: the rolled loop runs the
    same ops, so outputs match to f32 round-off amplified by the
    recurrence (~5e-7 relative per iteration on CPU), not bitwise. The
    gradient check damps the bezier head (as in
    test_precision_modes.py) and compares against the GLOBAL gradient
    scale: pre-norm conv biases have mathematically zero gradient
    (instance norm subtracts the mean), so their values are pure
    round-off and per-leaf relative error is meaningless there."""
    import dataclasses

    cfg_u = dataclasses.replace(DSEC_SMALL, detach_bezier=True)
    cfg_s = dataclasses.replace(cfg_u, scan_iters=True)
    voxel, images = make_inputs(cfg_u, rng=np.random.default_rng(7))

    m_u, m_s = RAFTSpline(cfg_u), RAFTSpline(cfg_s)
    variables = m_u.init(jax.random.PRNGKey(0), voxel, images,
                         test_mode=True)
    head = variables["params"]["update_block"]["bezier_head"]["conv2"]
    head["kernel"] = head["kernel"] * 0.02

    def close(a, b, tol):
        a, b = np.asarray(a), np.asarray(b)
        den = max(np.abs(b).max(), 1e-6)
        err = np.abs(a - b).max()
        assert err < tol * den, (err, den)

    # test mode: (final lowres bezier, upsampled)
    bz_u, up_u = m_u.apply(variables, voxel, images, test_mode=True)
    bz_s, up_s = m_s.apply(variables, voxel, images, test_mode=True)
    close(bz_s.params, bz_u.params, 1e-5)
    close(up_s.params, up_u.params, 1e-5)

    # train mode: every prediction + gradients of a seq-weighted loss
    def loss(m):
        def f(vs, v, im):
            preds = m.apply(vs, v, im)
            return sum(
                0.8 ** (len(preds) - 1 - i) * jnp.abs(p.params).mean()
                for i, p in enumerate(preds)
            )
        return f

    l_u, g_u = jax.value_and_grad(loss(m_u))(variables, voxel, images)
    l_s, g_s = jax.value_and_grad(loss(m_s))(variables, voxel, images)
    np.testing.assert_allclose(float(l_s), float(l_u), rtol=1e-5)
    flat_u = jax.tree_util.tree_leaves(g_u)
    flat_s = jax.tree_util.tree_leaves(g_s)
    gscale = max(float(np.abs(np.asarray(b)).max()) for b in flat_u)
    for a, b in zip(flat_s, flat_u):
        err = float(np.abs(np.asarray(a) - np.asarray(b)).max())
        assert err < 1e-3 * gscale, (err, gscale)


def test_dot_im2col_matches_lax_conv(rng):
    """Op-level: the im2col+dot rewrite computes the same SAME conv as
    lax.conv up to f32 reassociation, for every window the update block
    uses (3x3, 1x5, 5x1)."""
    from bflow_tpu.models.extractor import dot_im2col

    for kh, kw, ci, co in [(3, 3, 256, 192), (1, 5, 64, 32),
                           (5, 1, 64, 32), (7, 7, 4, 16)]:
        x = jnp.asarray(rng.standard_normal((2, 12, 16, ci)), jnp.float32)
        k = jnp.asarray(
            rng.standard_normal((kh, kw, ci, co)) / np.sqrt(kh * kw * ci),
            jnp.float32,
        )
        b = jnp.asarray(rng.standard_normal((co,)), jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((kh // 2, kh // 2), (kw // 2, kw // 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + b
        got = dot_im2col(x, k, b, None)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0, atol=1e-4,
            err_msg=f"window {(kh, kw, ci, co)}",
        )
