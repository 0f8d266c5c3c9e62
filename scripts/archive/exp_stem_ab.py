"""Same-session A/B: pallas s2d patch-matmul stem vs the direct XLA
strided conv, at the three flagship stem shapes (isolated op) and end
to end (pallas_stem flag).

The direct conv measured 6.0 ms for the 20x480x640x15 event-encoder
batch (~24 TFLOP/s, ~12% of bf16 peak) because XLA contracts only the
input channels per spatial tap. The kernel builds full-depth K=1024
patches in VMEM (ops/pallas/stem_conv.py).

Usage: python scripts/exp_stem_ab.py [batch=4]
"""

from __future__ import annotations

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def slope(name, f, *args, reps=(4, 12)):
    import jax

    results = {}
    for R in reps:
        out = f(R, *args)
        jax.block_until_ready(out)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(R, *args))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v), (name, v)
        results[R] = best
    r1, r2 = reps
    per = (results[r2] - results[r1]) / (r2 - r1) * 1e3
    print(f"{name:28s} {per:8.3f} ms/op", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bflow_tpu.ops.pallas.stem_conv import _stem_xla, stem_conv_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)

    # (inputs, H, W, C, O, k): the three 7x7 stems (ev encoder 5 grids,
    # img encoder 2, cnet 1) + the 3x3/s2 stage downsampling convs
    for name, (n, h, w, c, o, kk) in {
        "ev_stem_20x480x640x15": (5 * B, 480, 640, 15, 64, 7),
        "img_stem_8x480x640x3": (2 * B, 480, 640, 3, 64, 7),
        "cnet_stem_4x480x640x18": (B, 480, 640, 18, 64, 7),
        "stage2_s2_26x240x320x64": (26 * B // 4, 240, 320, 64, 96, 3),
        "stage3_s2_26x120x160x96": (26 * B // 4, 120, 160, 96, 128, 3),
    }.items():
        x = jnp.asarray(
            rng.standard_normal((n, h, w, c)), jnp.bfloat16
        )
        k = jnp.asarray(rng.standard_normal((kk, kk, c, o)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)

        def timed(fn, label):
            def make(R):
                @jax.jit
                def f(acc, x):
                    def body(i, acc):
                        out = fn(x + acc * 1e-30, k, b)
                        return acc + out.astype(jnp.float32).sum() * 1e-20
                    return jax.lax.fori_loop(0, R, body, acc)
                return f
            cache = {}
            def runner(R, x):
                if R not in cache:
                    cache[R] = make(R)
                return cache[R](jnp.float32(0.0), x)
            slope(label, runner, x)

        timed(lambda x, k, b: _stem_xla(x, k, b), f"{name} xla")
        timed(lambda x, k, b: stem_conv_pallas(x, k, b),
              f"{name} pallas")


if __name__ == "__main__":
    main()
