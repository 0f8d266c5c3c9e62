"""End-to-end numerical parity vs the ACTUAL reference PyTorch model.

Imports /root/reference/models/raft_spline/raft.py (the real network,
not a re-derivation), runs both frameworks from the SAME random-init
state dict on identical inputs in f32 parity mode, and asserts the
outputs agree:

  * full forward (test_mode) at 1 and 2 refinement iterations: tight
    (<=1e-4 relative error) for all four experiment architectures
    (DSEC E_LU4_BD2 / E_I_LU4_BD2, MultiFlow E_LU5_BD10 / E_I_LU5_BD10);
  * full forward at the production 12 iterations: the recurrence can
    amplify f32 associativity noise, so the 12-iter check asserts a
    looser bound and records the measured error.

The reference needs two tiny runtime stubs in this container: `numba`
(jit -> identity decorator; the decorated function is pure NumPy) and
`omegaconf` (only ListConfig is referenced, in an isinstance check).
No reference code is copied — it is imported and executed as the oracle.
"""

from __future__ import annotations

import pathlib
import sys
import types

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(
        not (REF / "models").is_dir(), reason="reference tree unavailable"
    ),
]


def _load_reference_raft():
    """Import the reference RAFTSpline with numba/omegaconf stubbed."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]) and not kwargs:
                return args[0]

            def deco(fn):
                return fn

            return deco

        numba.jit = jit
        sys.modules["numba"] = numba
    if "omegaconf" not in sys.modules:
        om = types.ModuleType("omegaconf")

        class ListConfig(list):
            pass

        class DictConfig(dict):
            pass

        om.ListConfig = ListConfig
        om.DictConfig = DictConfig
        sys.modules["omegaconf"] = om
    # Append (not prepend) so the reference's top-level packages (models,
    # utils, data, ...) never shadow anything resolvable from the repo.
    if str(REF) not in sys.path:
        sys.path.append(str(REF))
    from models.raft_spline.raft import RAFTSpline as TorchRAFTSpline

    return TorchRAFTSpline


def _model_params(cfg) -> dict:
    """Reference model_params dict for a RaftSplineConfig (the shape the
    hydra config tree produces, reference raft.py:15-73)."""
    return {
        "num_bins": {
            "context": cfg.nbins_context,
            "correlation": cfg.nbins_correlation,
        },
        "bezier_degree": cfg.bezier_degree,
        "detach_bezier": cfg.detach_bezier,
        "use_boundary_images": cfg.use_images,
        "use_events": cfg.use_events,
        "correlation": {
            "use_cosine_sim": False,
            "ev": {
                "target_indices": list(cfg.ev_target_indices),
                "levels": list(cfg.ev_levels),
                "radius": [cfg.radius] * len(cfg.ev_target_indices),
            },
            "img": {"levels": cfg.img_levels, "radius": cfg.img_radius},
        },
        "hidden": {"dim": cfg.hidden_dim},
        "context": {"dim": cfg.context_dim, "norm": cfg.context_norm},
        "feature": {"dim": cfg.feature_dim, "norm": cfg.feature_norm},
        "motion": {"dim": cfg.motion_dim},
    }


def _torch_forward(cfg, voxel_nchw, images_nchw, iters):
    """Reference forward (eval, f32, test_mode). Returns (low, up) params
    in our (N, H, W, P, 2) layout plus the exported 'net.*' state dict."""
    import torch

    TorchRAFTSpline = _load_reference_raft()
    torch.manual_seed(7)
    net = TorchRAFTSpline(_model_params(cfg)).eval()

    with torch.no_grad():
        images = None
        if cfg.use_images:
            images = [torch.from_numpy(im) for im in images_nchw]
        low, up = net(
            voxel_grid=torch.from_numpy(voxel_nchw),
            images=images,
            iters=iters,
            test_mode=True,
        )

    def to_ours(params_nchw):
        # (N, 2P, h, w) dim-major -> (N, h, w, P, 2)
        t = params_nchw.numpy()
        N, C, h, w = t.shape
        P = C // 2
        return t.reshape(N, 2, P, h, w).transpose(0, 3, 4, 2, 1)

    sd = {f"net.{k}": v for k, v in net.state_dict().items()}
    return to_ours(low.get_params()), to_ours(up.get_params()), sd


def _jax_forward(cfg, sd, voxel_nchw, images_nchw, iters):
    """Our forward from the imported state dict, f32 parity mode."""
    import jax
    import jax.numpy as jnp

    from bflow_tpu.importer.torch_ckpt import convert_state_dict
    from bflow_tpu.models import RAFTSpline

    model = RAFTSpline(cfg)
    voxel = jnp.asarray(voxel_nchw.transpose(0, 2, 3, 1))
    images = None
    if cfg.use_images:
        images = jnp.asarray(
            np.stack(images_nchw).transpose(0, 1, 3, 4, 2)
        )
    variables = model.init(jax.random.PRNGKey(0), voxel, images,
                           iters=1, test_mode=True)
    variables = convert_state_dict(sd, variables)
    low, up = model.apply(variables, voxel, images, iters=iters,
                          test_mode=True)
    return np.asarray(low.params), np.asarray(up.params)


def _rel_err(got, want):
    denom = max(np.abs(want).max(), 1e-8)
    return np.abs(got - want).max() / denom


def _make_cfg(name):
    from bflow_tpu.models import RaftSplineConfig

    if name.startswith("dsec"):
        return RaftSplineConfig(
            nbins_context=5, nbins_correlation=5, bezier_degree=2,
            ev_target_indices=(1, 2, 3, 4), ev_levels=(1, 1, 1, 4),
            use_events=True, use_images=name.endswith("images"),
            lookup_method="gather",
        )
    return RaftSplineConfig(
        nbins_context=41, nbins_correlation=25, bezier_degree=10,
        ev_target_indices=(8, 16, 24, 32, 40), ev_levels=(1, 1, 1, 1, 4),
        use_events=True, use_images=name.endswith("images"),
        lookup_method="gather",
    )


def _make_inputs(cfg, H=128, W=128, N=1, seed=3):
    # H/8 must be >= 16: with 4 pyramid levels the coarsest volume is
    # (H/64 x W/64), and the reference's bilinear_sampler divides by
    # (W_level - 1) — a 1x1 level produces inf/NaN in the REFERENCE
    # itself (models/raft_utils/utils.py:13-14). Real DSEC/MultiFlow
    # resolutions never hit this; parity inputs must not either.
    rng = np.random.default_rng(seed)
    voxel = rng.standard_normal(
        (N, cfg.nbins_total, H, W)
    ).astype(np.float32)
    images = [
        rng.integers(0, 255, (N, 3, H, W)).astype(np.float32)
        for _ in range(2)
    ]
    return voxel, images


CONFIGS = [
    "dsec_events",          # E_LU4_BD2_lowpyramid
    "dsec_events_images",   # E_I_LU4_BD2_lowpyramid
    "mf_events",            # E_LU5_BD10
    "mf_events_images",     # E_I_LU5_BD10
]


@pytest.mark.parametrize("name", CONFIGS)
def test_full_forward_parity_2iter(name):
    cfg = _make_cfg(name)
    voxel, images = _make_inputs(cfg)
    want_low, want_up, sd = _torch_forward(cfg, voxel, images, iters=2)
    got_low, got_up = _jax_forward(cfg, sd, voxel, images, iters=2)
    assert got_low.shape == want_low.shape
    assert got_up.shape == want_up.shape
    err_low = _rel_err(got_low, want_low)
    err_up = _rel_err(got_up, want_up)
    print(f"[parity:{name}] 2-iter rel err low={err_low:.3e} up={err_up:.3e}")
    assert err_low <= 1e-4, err_low
    assert err_up <= 1e-4, err_up


def test_full_forward_parity_12iter_flagship():
    """Production iteration count on the flagship (DSEC events+images).

    12 recurrent iterations amplify f32 associativity differences between
    the two frameworks' conv/matmul orderings; the bound here is looser
    by design, and the measured value is printed for the docs.
    """
    cfg = _make_cfg("dsec_events_images")
    voxel, images = _make_inputs(cfg)
    want_low, want_up, sd = _torch_forward(cfg, voxel, images, iters=12)
    got_low, got_up = _jax_forward(cfg, sd, voxel, images, iters=12)
    err_low = _rel_err(got_low, want_low)
    err_up = _rel_err(got_up, want_up)
    print(f"[parity:flagship] 12-iter rel err low={err_low:.3e} "
          f"up={err_up:.3e}")
    assert err_low <= 1e-3, err_low
    assert err_up <= 1e-3, err_up


def test_flow_at_t1_parity():
    """The DSEC supervision/eval quantity: flow queried at t=1 from the
    upsampled curve (reference bezier.py:195-197 fast path)."""
    import torch

    cfg = _make_cfg("dsec_events_images")
    voxel, images = _make_inputs(cfg, seed=11)

    TorchRAFTSpline = _load_reference_raft()
    torch.manual_seed(7)
    net = TorchRAFTSpline(_model_params(cfg)).eval()
    with torch.no_grad():
        _, up = net(
            voxel_grid=torch.from_numpy(voxel),
            images=[torch.from_numpy(im) for im in images],
            iters=2, test_mode=True,
        )
        want = up.get_flow_from_reference(time=1).numpy()  # (N,2,H,W)

    import jax
    import jax.numpy as jnp

    from bflow_tpu.importer.torch_ckpt import convert_state_dict
    from bflow_tpu.models import RAFTSpline

    sd = {f"net.{k}": v for k, v in net.state_dict().items()}
    model = RAFTSpline(cfg)
    voxel_j = jnp.asarray(voxel.transpose(0, 2, 3, 1))
    images_j = jnp.asarray(np.stack(images).transpose(0, 1, 3, 4, 2))
    variables = model.init(jax.random.PRNGKey(0), voxel_j, images_j,
                           iters=1, test_mode=True)
    variables = convert_state_dict(sd, variables)
    _, up_j = model.apply(variables, voxel_j, images_j, iters=2,
                          test_mode=True)
    got = np.asarray(up_j.flow_at(1.0)).transpose(0, 3, 1, 2)
    err = _rel_err(got, want)
    print(f"[parity:flow@t=1] rel err {err:.3e}")
    assert err <= 1e-4, err
