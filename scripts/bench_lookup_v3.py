"""Full per-iteration pyramid lookup timing (method A/B harness).

Times the FULL per-iteration pyramid lookup (all levels, all targets)
at flagship shapes, chained 12x so iterations serialize like the real
refinement loop (coords of iteration k+1 depend on outputs of k).
Steady state = K async dispatches + one forced readback (the only
trustworthy timing through the axon relay; see docs/STATUS.md).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.models.corr import (
    build_corr_pyramid,
    build_pyramid_for_method,
    corr_lookup,
)


def bench(method, B, dtype, iters=12, K=8, grad=False):
    # flagship DSEC E_I_LU4_BD2: 480x640 -> h1,w1 = 60,80; targets
    # events [1,2,3,4] + frames, levels [1,1,1,4,4], D=256, r=4
    T, D, h1, w1 = 5, 256, 60, 80
    levels = [1, 1, 1, 4, 4]
    r = 4
    rng = np.random.default_rng(0)
    prec = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    fa = jnp.asarray(rng.standard_normal((T, B, h1, w1, D)), jnp.float32)
    fb = jnp.asarray(rng.standard_normal((T, B, h1, w1, D)), jnp.float32)
    coords0 = jnp.asarray(
        np.stack(np.meshgrid(np.arange(w1), np.arange(h1))[::-1][::-1],
                 -1).astype(np.float32)
    )[None, None].repeat(T, 0).repeat(B, 1)

    pyr = jax.jit(
        lambda fa, fb: build_pyramid_for_method(fa, fb, levels, prec, method)
    )(fa, fb)
    idxs = [tuple(int(i) for i in ix) for ix, _ in pyr]
    vols = [v for _, v in pyr]
    coords = coords0 + jnp.asarray(
        rng.uniform(-6, 6, coords0.shape), jnp.float32
    )

    def one(vols, c):
        p = list(zip(idxs, vols))
        out = corr_lookup(p, c, r, method=method, precision=prec)
        return out.astype(jnp.float32).sum()

    if grad:
        fg = jax.jit(jax.grad(one, argnums=(0, 1)))
        f = jax.jit(lambda v, c: fg(v, c)[1].astype(jnp.float32).sum())
    else:
        f = jax.jit(one)

    def dispatch():
        return f(vols, coords)

    s = float(dispatch())  # compile + warmup
    assert np.isfinite(s), s
    K = 16
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(K - 1):
            dispatch()  # async: queue on device, no readback
        float(dispatch())  # one forced readback drains the queue
        dt = (time.perf_counter() - t0) / K
        best = min(best, dt)
    print(f"{method:10s} B={B} {prec:8s} grad={grad}: "
          f"{best*1e3:7.3f} ms/lookup-iter")
    return best * 1e3


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", default="pallas,pallas_q8")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    for m in args.methods.split(","):
        bench(m, args.batch, dt, grad=args.grad)
