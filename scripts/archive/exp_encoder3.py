"""Diagnose the event-encoder one-time cost (27.6 ms at B=4, ~9% MXU).

Slope-times (fori_loop, min-of-3, two R values) encoder variants on the
flagship 20x480x640x15 shape to attribute the cost:
  base      — production BasicEncoder (instance norm, bf16)
  nonorm    — norm='none' (isolates normalization cost)
  bf16in    — input voxel pre-cast to bf16 (halves stem read traffic)
  groupnorm — GroupNorm (single fused XLA op) for comparison
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.models.extractor import BasicEncoder


def slope(name, fn, x, reps=(2, 6)):
    results = {}
    for R in reps:
        f = fn(R)
        out = f(jnp.float32(0.0), x)
        jax.block_until_ready(out)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.0), x))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v), (name, v)
        results[R] = best
    r1, r2 = reps
    per = (results[r2] - results[r1]) / (r2 - r1) * 1e3
    print(f"{name:12s} {per:8.2f} ms/op  (R={r1}: {results[r1]*1e3:.1f}, "
          f"R={r2}: {results[r2]*1e3:.1f})")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5 * N, 480, 640, 15)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    print(f"# encoder diagnosis, batch={N} (20 inputs)")

    variants = {
        "base": dict(norm="instance", dtype=jnp.bfloat16, cast=None),
        "nonorm": dict(norm="none", dtype=jnp.bfloat16, cast=None),
        "bf16in": dict(norm="instance", dtype=jnp.bfloat16,
                       cast=jnp.bfloat16),
        "groupnorm": dict(norm="group", dtype=jnp.bfloat16, cast=None),
    }
    for name, v in variants.items():
        enc = BasicEncoder(256, v["norm"], dtype=v["dtype"])
        xin = x if v["cast"] is None else x.astype(v["cast"])
        vars_ = enc.init(key, jnp.asarray(xin[:1]))

        def mk(R, enc=enc, vars_=vars_):
            @jax.jit
            def f(acc, xx):
                def body(i, acc):
                    out = enc.apply(vars_, xx + acc)
                    return acc + out.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f

        slope(name, mk, jnp.asarray(xin))


if __name__ == "__main__":
    main()
