"""Same-session A/B: onehot_from_level mixed lookup dispatch on the
flagship inference graph (end to end, B=4 default).

The deep pyramid levels' maps are tiny (15x20, 7x10 at DSEC val) but
carry the same 4800 queries/target as level 0, so in the pallas slab
kernel they are all fixed cost — measured 0.7-1.3 ms each per iteration
at B=4 (slope timing) against ~25 us of essential MXU work. Dispatching
those levels to the onehot XLA path (tiny dense einsums that fuse into
the surrounding graph, no pallas grid) may reclaim most of it.

Compares onehot_from_level in {-1 (all-pallas), 3, 2, 1} end to end.

Usage: python scripts/exp_deep_onehot.py [batch=4]
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
    for from_lvl in (-1, 3, 2, 1):
        cfg = dataclasses.replace(base, onehot_from_level=from_lvl)
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
        results[from_lvl] = best
        print(
            f"onehot_from_level={from_lvl}: fwd {best*1e3:.1f} ms "
            f"({B/best:.2f} fields/s)",
            flush=True,
        )
    base_t = results[-1]
    for k, v in results.items():
        if k != -1:
            print(f"from_level={k}: {v/base_t:.3f}x of all-pallas")


if __name__ == "__main__":
    main()
