"""Slope-time each piece of the update block at flagship shapes (B=4,
60x80, bf16) to attribute its ~1.9 ms/iter cost before fusing anything.

Groups: motion-encoder convs, GRU passes, heads — plus the whole block
and the sum of parts (difference = fusion/glue).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


def convs(specs, act="relu", dt=jnp.bfloat16):
    """specs: list of (kh, kw, cin, cout). Chained convs + activation."""
    key = jax.random.PRNGKey(0)
    kernels = []
    for i, (kh, kw, ci, co) in enumerate(specs):
        k = jax.random.normal(jax.random.fold_in(key, i),
                              (kh, kw, ci, co), dt) * 0.02
        kernels.append(k)

    def mk(R):
        @jax.jit
        def f(acc, x):
            x = x.astype(dt)

            def body(i, acc):
                y = x + acc.astype(dt)
                for k in kernels:
                    p = ((k.shape[0] // 2,) * 2, (k.shape[1] // 2,) * 2)
                    y = jax.lax.conv_general_dilated(
                        y, k, (1, 1), p,
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    if act == "relu":
                        y = jax.nn.relu(y)
                return acc + y.astype(jnp.float32).sum() * 1e-20
            return jax.lax.fori_loop(0, R, body, acc)
        return f
    return mk


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w = 60, 80
    rng = np.random.default_rng(0)

    def arr(c):
        return jnp.asarray(rng.standard_normal((N, h, w, c)), jnp.float32)

    print(f"# update block internals, B={N}, {h}x{w}, bf16")
    parts = 0.0
    parts += slope("convc1 1x1 891->256", convs([(1, 1, 891, 256)]), arr(891))
    parts += slope("convc2 3x3 256->192", convs([(3, 3, 256, 192)]), arr(256))
    parts += slope("convf1 7x7 4->128", convs([(7, 7, 4, 128)]), arr(4))
    parts += slope("convf2 3x3 128->64", convs([(3, 3, 128, 64)]), arr(128))
    parts += slope("conv 3x3 256->126", convs([(3, 3, 256, 126)]), arr(256))
    # GRU: fused gates conv (1x5 386->384) + q_h conv (1x5 128->128), x2
    parts += slope("gru-h 1x5 386->384", convs([(1, 5, 386, 384)], act=""),
                   arr(386))
    parts += slope("gru-h qh 1x5 128->128", convs([(1, 5, 128, 128)],
                                                  act=""), arr(128))
    parts += slope("gru-v 5x1 386->384", convs([(5, 1, 386, 384)], act=""),
                   arr(386))
    parts += slope("gru-v qh 5x1 128->128", convs([(5, 1, 128, 128)],
                                                  act=""), arr(128))
    parts += slope("bez 3x3 128->256", convs([(3, 3, 128, 256)]), arr(128))
    parts += slope("bez 3x3 256->4", convs([(3, 3, 256, 4)]), arr(256))
    parts += slope("mask0 3x3 128->256", convs([(3, 3, 128, 256)]), arr(128))
    parts += slope("mask2 1x1 256->576", convs([(1, 1, 256, 576)]), arr(256))
    print(f"{'SUM OF PARTS':30s} {parts:8.3f} ms")

    # whole block for reference
    from __graft_entry__ import _flagship_config
    from bflow_tpu.models.update import BasicUpdateBlock

    cfg = _flagship_config()
    upd = BasicUpdateBlock(cfg)
    net0 = arr(cfg.hidden_dim)
    inp0 = arr(cfg.context_dim)
    corr0 = arr(cfg.corr_planes)
    bez0 = arr(2 * cfg.bezier_degree)
    vars_u = upd.init(jax.random.PRNGKey(0), net0, inp0, corr0, bez0)

    def mk(R):
        @jax.jit
        def f(acc, net, inp, corr, bez):
            def body(i, carry):
                acc, net = carry
                net2, mask, delta = upd.apply(vars_u, net, inp,
                                              corr + acc, bez)
                return (acc + mask.sum() * 1e-20 + delta.sum() * 1e-20,
                        net2.astype(net.dtype))
            acc, net = jax.lax.fori_loop(0, R, body, (acc, net))
            return acc + net.astype(jnp.float32).sum() * 1e-20
        return f

    slope("WHOLE BLOCK", mk, net0, inp0, corr0, bez0)


if __name__ == "__main__":
    main()
