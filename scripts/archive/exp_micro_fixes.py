"""Micro A/Bs for XLA-level reformulations of slow ops (same-session).

1. convc1: 1x1 conv 891->256 vs reshape+dot.
2. convf1: 7x7 conv on 4 input channels vs im2col+dot.
3. heads: two 3x3 128->256 convs on the same input vs one merged
   128->512 conv.
4. instance norm (fast mode): 2-reduction (mean, then var) vs
   single-pass E[x]/E[x^2], at stage-1 encoder shape.
"""

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
    print(f"{name:36s} {per:8.3f} ms/op")
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


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 60, 80
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    corr = jnp.asarray(rng.standard_normal((N, h, w, 891)), jnp.float32)
    k1 = jax.random.normal(key, (1, 1, 891, 256), DT) * 0.02

    def conv1x1(acc, x):
        x = (x + acc).astype(DT)
        return jax.lax.conv_general_dilated(
            x, k1, (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def dot1x1(acc, x):
        x = (x + acc).astype(DT)
        y = x.reshape(-1, 891) @ k1.reshape(891, 256)
        return y.reshape(N, h, w, 256)

    print(f"# micro fixes, B={N}")
    slope("convc1 1x1 conv", loop(conv1x1), corr)
    slope("convc1 reshape+dot", loop(dot1x1), corr)
    # bf16 input (as it would arrive from a bf16 lookup output)
    corrb = corr.astype(DT)
    slope("convc1 dot, bf16 in", loop(lambda a, x: (
        ((x + a.astype(DT)).reshape(-1, 891) @ k1.reshape(891, 256))
    )), corrb)

    bez = jnp.asarray(rng.standard_normal((N, h, w, 4)), jnp.float32)
    k7 = jax.random.normal(key, (7, 7, 4, 128), DT) * 0.02

    def conv7(acc, x):
        x = (x + acc).astype(DT)
        return jax.lax.conv_general_dilated(
            x, k7, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def im2col7(acc, x):
        x = (x + acc).astype(DT)
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        cols = [
            jax.lax.dynamic_slice(xp, (0, dy, dx, 0), (N, h, w, 4))
            for dy in range(7) for dx in range(7)
        ]
        patch = jnp.concatenate(cols, axis=-1)  # (N,h,w,196)
        y = patch.reshape(-1, 196) @ k7.reshape(196, 128)
        return y.reshape(N, h, w, 128)

    slope("convf1 7x7 conv (4ch)", loop(conv7), bez)
    slope("convf1 im2col+dot", loop(im2col7), bez)

    net = jnp.asarray(rng.standard_normal((N, h, w, 128)), jnp.float32)
    ka = jax.random.normal(key, (3, 3, 128, 256), DT) * 0.02
    kb = jax.random.normal(jax.random.fold_in(key, 1),
                           (3, 3, 128, 256), DT) * 0.02

    def two_heads(acc, x):
        x = (x + acc).astype(DT)
        p = ((1, 1), (1, 1))
        a = jax.lax.conv_general_dilated(
            x, ka, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = jax.lax.conv_general_dilated(
            x, kb, (1, 1), p, dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return a + b

    kab = jnp.concatenate([ka, kb], axis=-1)

    def one_head(acc, x):
        x = (x + acc).astype(DT)
        y = jax.lax.conv_general_dilated(
            x, kab, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y[..., :256] + y[..., 256:]

    slope("heads: two 3x3 convs", loop(two_heads), net)
    slope("heads: merged 3x3 conv", loop(one_head), net)

    # instance norm at stage-1 shape (20 inputs, 240x320x64 bf16)
    xs1 = jnp.asarray(
        rng.standard_normal((5 * N, 240, 320, 64)), DT)

    def inorm_2pass(acc, x):
        x = x + acc.astype(DT)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32) - mean),
                       axis=(1, 2), keepdims=True)
        return ((x.astype(jnp.float32) - mean)
                * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    def inorm_1pass(acc, x):
        x = x + acc.astype(DT)
        xf = x.astype(jnp.float32)
        m1 = jnp.mean(xf, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(jnp.square(xf), axis=(1, 2), keepdims=True)
        var = m2 - jnp.square(m1)
        return ((xf - m1) * jax.lax.rsqrt(var + 1e-5)).astype(x.dtype)

    slope("inorm 2-pass (current)", loop(inorm_2pass), xs1)
    slope("inorm E[x],E[x2]", loop(inorm_1pass), xs1)


if __name__ == "__main__":
    main()
