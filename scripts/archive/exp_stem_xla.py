"""Cheap XLA-level stem variants before committing to a Pallas stem.

All compute the 7x7/s2 15->64 stem (or a stand-in) on 20x480x640x15.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def slope(name, mk, *args, reps=(2, 6)):
    arrs = [jnp.asarray(a) for a in args]
    results = {}
    for R in reps:
        f = mk(R)
        out = f(jnp.float32(0.0), *arrs)
        jax.block_until_ready(out)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.0), *arrs))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v), (name, v)
        results[R] = best
    r1, r2 = reps
    per = (results[r2] - results[r1]) / (r2 - r1) * 1e3
    print(f"{name:24s} {per:8.2f} ms/op")


def main():
    B = 20
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 480, 640, 15)).astype(np.float32)
    k = (rng.standard_normal((7, 7, 15, 64)) * 0.05).astype(np.float32)

    def direct(dt, dn=("NHWC", "HWIO", "NHWC")):
        def mk(R):
            @jax.jit
            def f(acc, x, k):
                if dn[0] == "NCHW":
                    x = x.transpose(0, 3, 1, 2)
                    k = k.transpose(3, 2, 0, 1)  # OIHW
                x = x.astype(dt)
                k = k.astype(dt)

                def body(i, acc):
                    y = jax.lax.conv_general_dilated(
                        x + acc.astype(dt), k, (2, 2), ((3, 3), (3, 3)),
                        dimension_numbers=(dn if dn[0] != "NCHW" else
                                           ("NCHW", "OIHW", "NCHW")),
                    )
                    return acc + y.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f
        return mk

    slope("direct bf16 NHWC", direct(jnp.bfloat16), x, k)
    slope("direct f32 NHWC", direct(jnp.float32), x, k)
    slope("direct bf16 NCHW", direct(jnp.bfloat16, ("NCHW",)), x, k)

    # channel-padded to 32 (zero-padded taps)
    xp = np.zeros((B, 480, 640, 32), np.float32)
    xp[..., :15] = x
    kp = np.zeros((7, 7, 32, 64), np.float32)
    kp[:, :, :15] = k
    slope("direct bf16 C=32", direct(jnp.bfloat16), xp, kp)

    # stride-1 7x7 at 240x320x60-equivalent FLOPs for reference:
    xs = rng.standard_normal((B, 240, 320, 60)).astype(np.float32)
    ks = (rng.standard_normal((4, 4, 60, 64)) * 0.05).astype(np.float32)

    def s1(dt):
        def mk(R):
            @jax.jit
            def f(acc, x, k):
                x = x.astype(dt)
                k = k.astype(dt)

                def body(i, acc):
                    y = jax.lax.conv_general_dilated(
                        x + acc.astype(dt), k, (1, 1), ((2, 1), (2, 1)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    )
                    return acc + y.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f
        return mk

    slope("s2d-equiv 4x4 s1 C=60", s1(jnp.bfloat16), xs, ks)


def main2():
    """A/B: direct stem vs s2d rewrite (XLA repack) at flagship shape."""
    import flax.linen as nn  # noqa
    from bflow_tpu.models.extractor import StemConv

    B = 20
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 480, 640, 15)).astype(np.float32)
    key = jax.random.PRNGKey(0)
    for use_s2d in (False, True):
        stem = StemConv(64, dtype=jnp.bfloat16, use_s2d=use_s2d)
        vars_ = stem.init(key, jnp.asarray(x[:1]))

        def mk(R, stem=stem, vars_=vars_):
            @jax.jit
            def f(acc, xx):
                def body(i, acc):
                    y = stem.apply(vars_, xx + acc)
                    return acc + y.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f

        slope(f"stem use_s2d={use_s2d}", mk, x)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "ab":
        main2()
    else:
        main()
