"""Same-session A/B: lookup_method=pallas (bf16 slab) vs pallas_q8
(int8 slab, inference only).

The int8 slab halves the dominant per-iteration HBM stream (the
level-0/1 volume read) at the cost of a per-chunk int8->bf16 cast and
the quantization pass at volume-build time. Measures the flagship
inference graph end to end plus the accuracy delta between the two
modes on the same weights/inputs (flow@t=1).

Usage: python scripts/exp_q8_ab.py [batch=4]
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

    flows = {}
    results = {}
    for method in ("pallas_q8", "pallas"):
        cfg = dataclasses.replace(base, lookup_method=method)
        model = RAFTSpline(cfg)
        variables = jax.jit(
            lambda v, i, m=model: m.init(
                jax.random.PRNGKey(0), v, i, test_mode=True
            )
        )(voxel0, images0)

        fwd = jax.jit(
            lambda va, v, i, m=model: m.apply(
                va, v, i, test_mode=True
            )[1].flow_at(1.0)
        )
        t0 = time.perf_counter()
        compiled = fwd.lower(variables, voxel, images).compile()
        t_compile = time.perf_counter() - t0
        out = compiled(variables, voxel, images)
        out.block_until_ready()
        flows[method] = np.asarray(out, np.float32)
        K = 8
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                compiled(variables, voxel, images)
            compiled(variables, voxel, images).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / K)
        results[method] = best
        print(
            f"{method}: compile {t_compile:.1f}s  fwd {best*1e3:.1f} ms"
            f"  ({B/best:.2f} fields/s)",
            flush=True,
        )

    d = np.abs(flows["pallas_q8"] - flows["pallas"])
    mag = max(np.abs(flows["pallas"]).max(), 1e-8)
    epe = np.linalg.norm(
        flows["pallas_q8"] - flows["pallas"], axis=-1
    ).mean()
    print(
        f"q8/bf16 fwd: {results['pallas_q8']/results['pallas']:.3f}x  "
        f"flow@1 max|d|={d.max():.3e} rel={d.max()/mag:.3e} "
        f"mean-EPE-delta={epe:.4e} px"
    )


if __name__ == "__main__":
    main()
