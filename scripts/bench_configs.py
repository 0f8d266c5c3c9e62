"""Inference throughput of all four benchmark configs on the TPU.

BASELINE.md lists four configs to measure (DSEC x MultiFlow,
events-only x events+images). bench.py covers the flagship
(DSEC E_I); this script compiles and times the full set at their
native eval resolutions and iteration counts, as a compile-coverage
check and a per-config throughput table for the docs.

Usage: python scripts/bench_configs.py [reps=6]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def configs():
    from bflow_tpu.models import RaftSplineConfig

    # architecture dims from the experiment overlays
    # (bflow_tpu/config/experiment/**, mirrored from the reference)
    dsec = dict(nbins_context=15, nbins_correlation=15, bezier_degree=2,
                detach_bezier=False)
    mf = dict(nbins_context=41, nbins_correlation=25, bezier_degree=10,
              detach_bezier=False,
              ev_target_indices=(8, 16, 24, 32, 40),
              ev_levels=(1, 1, 1, 1, 4))
    return {
        "dsec_E_LU4_BD2": (
            RaftSplineConfig(
                **dsec, use_events=True, use_images=False,
                ev_target_indices=(1, 2, 3, 4), ev_levels=(1, 1, 1, 4),
                corr_precision="bfloat16", compute_dtype="bfloat16",
            ),
            (480, 640), 1,
        ),
        "dsec_E_I_LU4_BD2": (
            RaftSplineConfig(
                **dsec, use_events=True, use_images=True,
                ev_target_indices=(1, 2, 3, 4), ev_levels=(1, 1, 1, 4),
                img_levels=4, img_radius=4,
                corr_precision="bfloat16", compute_dtype="bfloat16",
            ),
            (480, 640), 8,
        ),
        "mf_E_LU5_BD10": (
            RaftSplineConfig(
                **mf, use_events=True, use_images=False,
                corr_precision="bfloat16", compute_dtype="bfloat16",
            ),
            (384, 512), 8,
        ),
        "mf_E_I_LU5_BD10": (
            RaftSplineConfig(
                **mf, use_events=True, use_images=True,
                img_levels=4, img_radius=4,
                corr_precision="bfloat16", compute_dtype="bfloat16",
            ),
            (384, 512), 8,
        ),
    }


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bflow_tpu.models import RAFTSpline

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rng = np.random.default_rng(0)
    print(f"# bench_configs: backend={jax.default_backend()}")

    for name, (cfg, (H, W), batch) in configs().items():
        model = RAFTSpline(cfg)
        voxel = jnp.asarray(
            rng.standard_normal((batch, H, W, cfg.nbins_total)),
            jnp.float32,
        )
        images = (
            jnp.asarray(
                rng.integers(0, 255, (2, batch, H, W, 3)), jnp.float32
            )
            if cfg.use_images
            else None
        )
        variables = jax.jit(
            lambda v, i: model.init(
                jax.random.PRNGKey(0), v, i, test_mode=True
            )
        )(voxel, images)

        @jax.jit
        def fwd(variables, v, i):
            _, up = model.apply(variables, v, i, test_mode=True)
            return up.flow_at(1.0).sum()

        s = float(fwd(variables, voxel, images))
        assert np.isfinite(s), (name, s)
        t0 = time.perf_counter()
        for _ in range(reps - 1):
            fwd(variables, voxel, images)
        float(fwd(variables, voxel, images))
        dt = time.perf_counter() - t0
        print(
            f"{name:22s} batch={batch} {H}x{W}: "
            f"{batch * reps / dt:7.2f} fields/s "
            f"({dt / reps * 1e3:.1f} ms/fwd)"
        )


if __name__ == "__main__":
    main()
