"""A/B: remaining update-block convs as XLA conv vs im2col+dot at
60x80 flagship shapes (bf16). Candidates: 3x3 256->192, 3x3 256->126,
3x3 128->256, 1x5 386->384, 5x1 386->384, 1x1 256->576."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


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
    print(f"{name:30s} {per:8.3f} ms/op")
    return per


def loop(fn):
    def mk(R):
        @jax.jit
        def f(acc, *xs):
            def body(i, acc):
                y = fn(acc, *xs)
                return acc + y.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f
    return mk


def case(name, kh, kw, ci, co, N, h, w, rng, key):
    x = jnp.asarray(rng.standard_normal((N, h, w, ci)), jnp.float32)
    k = jax.random.normal(key, (kh, kw, ci, co), DT) * 0.02
    ph, pw = kh // 2, kw // 2

    def conv(acc, x):
        x = (x + acc).astype(DT)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dot(acc, x):
        x = (x + acc).astype(DT)
        if (kh, kw) == (1, 1):
            y = x.reshape(-1, ci) @ k.reshape(ci, co)
            return y.reshape(N, h, w, co)
        xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (N, h, w, ci))
            for dy in range(kh) for dx in range(kw)
        ]
        patch = jnp.concatenate(cols, axis=-1)
        y = patch.reshape(-1, kh * kw * ci) @ k.reshape(kh * kw * ci, co)
        return y.reshape(N, h, w, co)

    a = slope(f"{name} conv", loop(conv), x)
    b = slope(f"{name} dot", loop(dot), x)
    print(f"  -> {'dot' if b < a else 'conv'} by {abs(a-b):.3f} ms")


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    print(f"# conv-vs-dot at 60x80, B={N}")
    case("3x3 256->192", 3, 3, 256, 192, N, 60, 80, rng, key)
    case("3x3 256->126", 3, 3, 256, 126, N, 60, 80, rng, key)
    case("3x3 128->256", 3, 3, 128, 256, N, 60, 80, rng, key)
    case("1x5 386->384", 1, 5, 386, 384, N, 60, 80, rng, key)
    case("5x1 386->384", 5, 1, 386, 384, N, 60, 80, rng, key)
    case("1x1 256->576", 1, 1, 256, 576, N, 60, 80, rng, key)
    case("3x3 128->64", 3, 3, 128, 64, N, 60, 80, rng, key)


if __name__ == "__main__":
    main()
