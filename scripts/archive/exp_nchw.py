"""A/B: encoder convs with NHWC vs NCHW dimension numbers, per stage.

Prior finding (same-session): the 7x7 s2 stem at flagship shape ran
2.31 ms as NCHW vs 3.42 ms as NHWC. This times every encoder stage in
both layouts (bf16, no norm) plus the full conv stack end-to-end with a
single layout, to decide whether the encoder should switch.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(name, mk, x, reps=(2, 6)):
    results = {}
    for R in reps:
        f = mk(R)
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
    print(f"{name:34s} {per:8.2f} ms/op")
    return per


def conv_stack(specs, layout, dt=jnp.bfloat16):
    """specs: list of (kh, kw, cin, cout, stride); layout 'NHWC'|'NCHW'."""
    key = jax.random.PRNGKey(0)
    kernels = []
    for i, (kh, kw, ci, co, s) in enumerate(specs):
        k = jax.random.normal(
            jax.random.fold_in(key, i), (kh, kw, ci, co), dt
        ) * 0.05
        kernels.append((k, s))
    dn = (layout, "HWIO", layout)

    def mk(R):
        @jax.jit
        def f(acc, x):
            x = x.astype(dt)

            def body(i, acc):
                y = x + acc.astype(dt)
                for k, s in kernels:
                    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2)
                    y = jax.lax.conv_general_dilated(
                        y, k, (s, s), p, dimension_numbers=dn,
                    )
                return acc + y.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f
    return mk


STAGES = [
    ("stem 7x7s2 15->64", [(7, 7, 15, 64, 2)], (480, 640, 15)),
    ("layer1 4x conv3 64", [(3, 3, 64, 64, 1)] * 4, (240, 320, 64)),
    ("layer2 s2+3x 96", [(3, 3, 64, 96, 2)] + [(3, 3, 96, 96, 1)] * 3,
     (240, 320, 64)),
    ("layer3 s2+3x 128", [(3, 3, 96, 128, 2)] + [(3, 3, 128, 128, 1)] * 3,
     (120, 160, 96)),
    ("out 1x1 128->256", [(1, 1, 128, 256, 1)], (60, 80, 128)),
]

FULL = ([(7, 7, 15, 64, 2)] + [(3, 3, 64, 64, 1)] * 4
        + [(3, 3, 64, 96, 2)] + [(3, 3, 96, 96, 1)] * 3
        + [(3, 3, 96, 128, 2)] + [(3, 3, 128, 128, 1)] * 3
        + [(1, 1, 128, 256, 1)])


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    B = 5 * N
    rng = np.random.default_rng(0)
    print(f"# NHWC vs NCHW conv stages, {B} inputs, bf16")
    for name, specs, (h, w, c) in STAGES:
        xh = jnp.asarray(rng.standard_normal((B, h, w, c)), jnp.float32)
        xc = jnp.transpose(xh, (0, 3, 1, 2))
        a = slope(f"{name} NHWC", conv_stack(specs, "NHWC"), xh)
        b = slope(f"{name} NCHW", conv_stack(specs, "NCHW"), xc)
        print(f"  -> {'NCHW' if b < a else 'NHWC'} wins by "
              f"{abs(a - b):.2f} ms")
    xh = jnp.asarray(rng.standard_normal((B, 480, 640, 15)), jnp.float32)
    xc = jnp.transpose(xh, (0, 3, 1, 2))
    slope("FULL stack NHWC", conv_stack(FULL, "NHWC"), xh)
    slope("FULL stack NCHW", conv_stack(FULL, "NCHW"), xc)


if __name__ == "__main__":
    main()
