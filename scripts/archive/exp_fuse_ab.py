"""Same-session A/B: fuse_corr_conv=True vs False on the flagship
inference graph (end to end, B=4 default).

True feeds the motion encoder's convc1 from the per-level lookup
outputs as partial-sum einsums; False materializes the ~900-channel
corr concat every iteration (see scripts/exp_fuse_c1.py for the
isolated op A/B and tests/test_model.py for equivalence).

Usage: python scripts/exp_fuse_ab.py [batch=4]
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from bflow_tpu.models import RAFTSpline

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    H, W = 480, 640
    base = _flagship_config()
    rng = np.random.default_rng(0)
    voxel = jnp.asarray(
        rng.standard_normal((B, H, W, base.nbins_total)), jnp.float32
    )
    images = jnp.asarray(
        rng.integers(0, 255, (2, B, H, W, 3)), jnp.float32
    )
    voxel0 = jnp.zeros((1, 64, 64, base.nbins_total), jnp.float32)
    images0 = jnp.zeros((2, 1, 64, 64, 3), jnp.float32)

    results = {}
    for fuse in (True, False):
        cfg = dataclasses.replace(base, fuse_corr_conv=fuse)
        model = RAFTSpline(cfg)
        variables = jax.jit(
            lambda v, i, m=model: m.init(
                jax.random.PRNGKey(0), v, i, test_mode=True
            )
        )(voxel0, images0)
        fwd = jax.jit(
            lambda va, v, i, m=model: m.apply(
                va, v, i, test_mode=True
            )[1].flow_at(1.0).sum()
        )
        s = float(fwd(variables, voxel, images))  # compile + warmup
        assert np.isfinite(s)
        K = 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                fwd(variables, voxel, images)
            float(fwd(variables, voxel, images))
            best = min(best, (time.perf_counter() - t0) / K)
        results[fuse] = best
        print(
            f"fuse_corr_conv={fuse}: fwd {best*1e3:.1f} ms "
            f"({B/best:.2f} fields/s)",
            flush=True,
        )
    print(f"fused/concat: {results[True]/results[False]:.3f}x")


if __name__ == "__main__":
    main()
