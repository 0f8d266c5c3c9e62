"""Same-session A/B: pallas 3x3 patch-matmul conv vs the XLA conv at
the encoder residual-stage shapes (isolated op, slope timing).

Usage: python scripts/exp_conv_ab.py [batch=4]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bflow_tpu.ops.pallas.conv3x3 import _conv_xla, conv3x3_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rng = np.random.default_rng(0)

    def slope(label, runner, x, reps=(4, 12)):
        results = {}
        for R in reps:
            out = runner(R, x)
            jax.block_until_ready(out)
            float(out)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(runner(R, x))
                best = min(best, time.perf_counter() - t0)
                assert np.isfinite(v), (label, v)
            results[R] = best
        r1, r2 = reps
        per = (results[r2] - results[r1]) / (r2 - r1) * 1e3
        print(f"{label:30s} {per:8.3f} ms/op", flush=True)

    # (inputs, H, W, C, O, kh, kw): encoder stages (26-input set at
    # B=4), the fused GRU gate conv, and the update-block 3x3s
    for name, (n, h, w, c, o, kh, kw) in {
        "stage1_26x240x320x64": (26 * B // 4, 240, 320, 64, 64, 3, 3),
        "stage2_26x120x160x96": (26 * B // 4, 120, 160, 96, 96, 3, 3),
        "stage3_26x60x80x128": (26 * B // 4, 60, 80, 128, 128, 3, 3),
        "gru_1x5_60x80x384": (B, 60, 80, 384, 384, 1, 5),
        "gru_5x1_60x80x384": (B, 60, 80, 384, 384, 5, 1),
        "convc2_60x80x256_192": (B, 60, 80, 256, 192, 3, 3),
        "mask0_60x80x128_256": (B, 60, 80, 128, 256, 3, 3),
        "convf1_7x7_60x80x4_128": (B, 60, 80, 4, 128, 7, 7),
    }.items():
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((kh, kw, c, o)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)

        def timed(fn, label):
            cache = {}

            def make(R):
                @jax.jit
                def f(acc, x):
                    def body(i, acc):
                        out = fn(x + acc * 1e-30, k, b)
                        return acc + out.astype(jnp.float32).sum() * 1e-20
                    return jax.lax.fori_loop(0, R, body, acc)
                return f

            def runner(R, x):
                if R not in cache:
                    cache[R] = make(R)
                return cache[R](jnp.float32(0.0), x)

            slope(label, runner, x)

        timed(lambda x, k, b: _conv_xla(x, k, b), f"{name} xla")
        timed(lambda x, k, b: conv3x3_pallas(x, k, b), f"{name} pallas")


if __name__ == "__main__":
    main()
