"""Attribute the ~11 ms of unaccounted one-time forward cost (B=4).

Times: standard pyramid build, pallas (slab) pyramid build (diff =
to_slab transposes), the 5-window voxel slicing+stack in f32 vs bf16,
and image normalization glue.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from __graft_entry__ import _flagship_config
from bflow_tpu.models.corr import build_corr_pyramid, build_pyramid_for_method


def slope(name, mk, *xs, reps=(4, 12)):
    results = {}
    for R in reps:
        f = mk(R)
        out = f(jnp.float32(0.0), *xs)
        jax.block_until_ready(out)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.0), *xs))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v), (name, v)
        results[R] = best
    r1, r2 = reps
    per = (results[r2] - results[r1]) / (r2 - r1) * 1e3
    print(f"{name:34s} {per:8.2f} ms/op")
    return per


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cfg = _flagship_config()
    rng = np.random.default_rng(0)
    h1, w1, D, T = 60, 80, cfg.feature_dim, cfg.num_targets
    fr = jnp.asarray(rng.standard_normal((T, N, h1, w1, D)) * 0.5,
                     jnp.float32)
    ft = jnp.asarray(rng.standard_normal((T, N, h1, w1, D)) * 0.5,
                     jnp.float32)

    def mk_pyr(method):
        def mk(R):
            @jax.jit
            def f(acc, fr, ft):
                def body(i, acc):
                    pyr = build_pyramid_for_method(
                        fr + acc, ft, cfg.levels_per_target,
                        precision=cfg.corr_precision, method=method)
                    return acc + sum(
                        v.astype(jnp.float32).sum() for _, v in pyr
                    ) * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f
        return mk

    print(f"# one-time glue attribution, B={N}")
    a = slope("pyramid standard", mk_pyr("gather"), fr, ft)
    b = slope("pyramid slab (pallas)", mk_pyr("pallas"), fr, ft)
    print(f"  -> to_slab transposes: {b - a:.2f} ms")

    voxel = jnp.asarray(
        rng.standard_normal((N, 480, 640, cfg.nbins_total)), jnp.float32)

    def mk_slice(cast):
        def mk(R):
            @jax.jit
            def f(acc, v):
                def body(i, acc):
                    vv = v + acc
                    if cast:
                        vv = vv.astype(jnp.bfloat16)
                    grids = [
                        vv[..., idx: idx + cfg.nbins_correlation]
                        for idx in (0, *cfg.ev_target_indices)
                    ]
                    g = jnp.concatenate(grids, axis=0)
                    return acc + g.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f
        return mk

    slope("voxel slice+stack f32", mk_slice(False), voxel)
    slope("voxel slice+stack bf16-first", mk_slice(True), voxel)


if __name__ == "__main__":
    main()
