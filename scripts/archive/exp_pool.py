"""Microbench: 2x2 avg-pool variants over the last two axes (scratch)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    T, N, h, w = 5, 4, 60, 80
    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.standard_normal((T, N, h, w, h, w)), jnp.float32
    ).astype(jnp.bfloat16)

    def timed(name, make, reps=(4, 16)):
        res = {}
        for R in reps:
            f = make(R)
            float(f(jnp.float32(0.0), vol))
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.0), vol))
            res[R] = time.perf_counter() - t0
            assert np.isfinite(v)
        r1, r2 = reps
        print(f"{name:24s} {(res[r2]-res[r1])/(r2-r1)*1e3:8.2f} ms")

    def trunc(v):
        hh, ww = v.shape[-2:]
        return v[..., : hh // 2 * 2, : ww // 2 * 2]

    def wrap(pool):
        def chain(vol):
            v1 = pool(vol)
            v2 = pool(v1[jnp.asarray((3, 4))])
            v3 = pool(v2)
            return (v1.astype(jnp.float32).sum()
                    + v3.astype(jnp.float32).sum())

        def make(R):
            @jax.jit
            def f(acc, vol):
                def it(i, acc):
                    return acc + chain(vol + acc.astype(vol.dtype)) * 1e-20
                return jax.lax.fori_loop(0, R, it, acc)
            return f
        return make

    # current: reshape + mean
    def pool_reshape(v):
        v = trunc(v)
        *lead, hh, ww = v.shape
        v = v.reshape(*lead, hh // 2, 2, ww // 2, 2)
        return v.mean(axis=(-3, -1))

    timed("reshape_mean", wrap(pool_reshape))

    # strided slices
    def pool_strided(v):
        v = trunc(v)
        return (v[..., 0::2, 0::2] + v[..., 0::2, 1::2]
                + v[..., 1::2, 0::2] + v[..., 1::2, 1::2]) * 0.25

    timed("strided", wrap(pool_strided))

    # reduce_window
    def pool_rw(v):
        v = trunc(v)
        ones = (1,) * (v.ndim - 2)
        out = jax.lax.reduce_window(
            v, jnp.zeros((), v.dtype), jax.lax.add,
            ones + (2, 2), ones + (2, 2), "VALID")
        return out * 0.5 * 0.5

    timed("reduce_window", wrap(pool_rw))

    # flatten leading dims + reduce_window (4D input)
    def pool_rw4(v):
        v = trunc(v)
        lead = v.shape[:-2]
        hh, ww = v.shape[-2:]
        x = v.reshape(-1, hh, ww)
        out = jax.lax.reduce_window(
            x, jnp.zeros((), v.dtype), jax.lax.add,
            (1, 2, 2), (1, 2, 2), "VALID")
        return (out * 0.25).reshape(*lead, hh // 2, ww // 2)

    timed("reduce_window_3d", wrap(pool_rw4))


if __name__ == "__main__":
    main()
