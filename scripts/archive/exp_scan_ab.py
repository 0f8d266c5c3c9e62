"""Same-session A/B: scan_iters=True vs unrolled refinement loop.

Measures compile time AND steady-state forward throughput for the
flagship inference graph at a chosen batch. The scan form trades
nothing semantically (tests/test_model.py equivalence); this measures
whether XLA's rolled-loop scheduling costs runtime on the in-order
core.

Usage: python scripts/exp_scan_ab.py [batch=4]
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
    for scan in (True, False):  # scan first: order bias favors neither
        cfg = dataclasses.replace(base, scan_iters=scan)
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
        t0 = time.perf_counter()
        lowered = fwd.lower(variables, voxel, images)
        t_trace = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        s = float(compiled(variables, voxel, images))  # warmup
        assert np.isfinite(s)
        K = 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                compiled(variables, voxel, images)
            float(compiled(variables, voxel, images))
            best = min(best, (time.perf_counter() - t0) / K)
        results[scan] = (t_trace, t_compile, best)
        print(
            f"scan={scan}: trace {t_trace:.1f}s  compile {t_compile:.1f}s"
            f"  fwd {best*1e3:.1f} ms  ({B/best:.2f} fields/s)",
            flush=True,
        )

    tr_s, co_s, fw_s = results[True]
    tr_u, co_u, fw_u = results[False]
    print(
        f"scan/unrolled: trace {tr_s/tr_u:.2f}x  compile {co_s/co_u:.2f}x"
        f"  fwd {fw_s/fw_u:.3f}x"
    )


if __name__ == "__main__":
    main()
