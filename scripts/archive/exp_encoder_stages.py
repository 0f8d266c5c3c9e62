"""Stage-by-stage slope timing of the event encoder at flagship shape.

Times raw conv stacks (no norm) per stage at the stage's native
resolution to find which convs eat the 22 ms norm-free encoder cost.
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
    print(f"{name:28s} {per:8.2f} ms/op")
    return per


def conv_stack(specs, dt=jnp.bfloat16):
    """specs: list of (kh, kw, cin, cout, stride). Returns mk(R)."""
    key = jax.random.PRNGKey(0)
    kernels = []
    for i, (kh, kw, ci, co, s) in enumerate(specs):
        k = jax.random.normal(
            jax.random.fold_in(key, i), (kh, kw, ci, co), dt
        ) * 0.05
        kernels.append((k, s))

    def mk(R):
        @jax.jit
        def f(acc, x):
            x = x.astype(dt)

            def body(i, acc):
                y = x + acc.astype(dt)
                for k, s in kernels:
                    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2)
                    y = jax.lax.conv_general_dilated(
                        y, k, (s, s), p,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                return acc + y.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f
    return mk


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    B = 5 * N  # 20 encoder inputs
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.standard_normal((B, 480, 640, 15)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((B, 240, 320, 64)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, 120, 160, 96)), jnp.float32)
    x3 = jnp.asarray(rng.standard_normal((B, 60, 80, 128)), jnp.float32)

    print(f"# encoder stage timing, {B} inputs, bf16")
    slope("stem 7x7s2 15->64", conv_stack([(7, 7, 15, 64, 2)]), x0)
    slope("layer1 4x conv3 64", conv_stack([(3, 3, 64, 64, 1)] * 4), x1)
    slope("layer2 conv s2 64->96", conv_stack([(3, 3, 64, 96, 2)]), x1)
    slope("layer2 3x conv3 96", conv_stack([(3, 3, 96, 96, 1)] * 3), x2)
    slope("layer3 conv s2 96->128", conv_stack([(3, 3, 96, 128, 2)]), x2)
    slope("layer3 3x conv3 128", conv_stack([(3, 3, 128, 128, 1)] * 3), x3)
    slope("out 1x1 128->256", conv_stack([(1, 1, 128, 256, 1)]), x3)
    # layer1 alternatives
    slope("layer1 4x conv3 64->128w",
          conv_stack([(3, 3, 64, 128, 1), (3, 3, 128, 64, 1)] * 2), x1)


if __name__ == "__main__":
    main()
