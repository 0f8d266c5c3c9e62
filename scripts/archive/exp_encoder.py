"""Encoder stage/ceiling microbenchmarks on the TPU.

Breaks the BasicEncoder forward into stem / stages / norms and compares
against raw-conv ceilings at the same shapes, to locate where the
one-time encoder cost goes (VERDICT r1: 'encoders at the conv ceiling'
deserves a falsification attempt).

Usage: python scripts/exp_encoder.py [batch=4] [stage ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bflow_tpu.models.extractor import (
        BasicEncoder,
        ResidualBlock,
        StemConv,
        instance_norm,
    )

    args = sys.argv[1:]
    N = int(args[0]) if args and args[0].isdigit() else 4
    only = set(a for a in args if not a.isdigit())
    NN = 5 * N  # the event-encoder batch (5 correlation grids)
    H, W = 480, 640
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    print(f"# encoder breakdown: stacked batch={NN}, backend={jax.default_backend()}")

    def timed(name, make_fn, *args_np, reps=(2, 8), flops=None):
        if only and name not in only:
            return
        arrs = [jnp.asarray(a) for a in args_np]
        res = {}
        for R in reps:
            fn = make_fn(R)
            out = fn(jnp.float32(0.0), *arrs)
            jax.block_until_ready(out)
            float(out)
            t0 = time.perf_counter()
            v = float(fn(jnp.float32(0.0), *arrs))
            res[R] = time.perf_counter() - t0
            assert np.isfinite(v), (name, v)
        r1, r2 = reps
        per = (res[r2] - res[r1]) / (r2 - r1) * 1e3
        eff = f"  {flops / (per * 1e-3) / 1e12:6.1f} TFLOP/s" if flops else ""
        print(f"{name:22s} {per:8.2f} ms/op{eff}")
        return per

    def loop(apply):
        def make(R):
            @jax.jit
            def f(acc, *xs):
                def body(i, acc):
                    out = apply(*[x + acc if x.dtype == jnp.float32 else x
                                  for x in xs])
                    return acc + out.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)
            return f
        return make

    dt = jnp.bfloat16

    # ---- full encoder + norm ablation -------------------------------
    x0 = rng.standard_normal((NN, H, W, 15)).astype(np.float32)
    for norm in ("instance", "none"):
        enc = BasicEncoder(256, norm, dtype=dt)
        v = enc.init(key, x0[:1])
        timed(f"encoder_{norm}", loop(lambda x, e=enc, v=v: e.apply(v, x)), x0)

    # ---- stages ------------------------------------------------------
    stem = StemConv(64, dtype=dt)
    vs = stem.init(key, x0[:1])
    timed(
        "stem_s2d",
        loop(lambda x: stem.apply(vs, x)), x0,
        flops=2 * NN * (H // 2) * (W // 2) * 64 * 49 * 15,
    )

    shapes = {
        "layer1": ((NN, 240, 320, 64), 64, 1),
        "layer2": ((NN, 240, 320, 64), 96, 2),
        "layer3": ((NN, 120, 160, 96), 128, 2),
    }
    for name, (in_shape, planes, stride) in shapes.items():
        xs = rng.standard_normal(in_shape).astype(np.float32)
        blk = ResidualBlock(planes, "instance", stride, dtype=dt)
        vb = blk.init(key, jnp.asarray(xs[:1]))
        ho, wo = in_shape[1] // stride, in_shape[2] // stride
        fl = 2 * NN * ho * wo * planes * 9 * (in_shape[3] + planes)
        timed(f"{name}_block0", loop(lambda x, b=blk, v=vb: b.apply(v, x)),
              xs, flops=fl)

    # ---- instance norm alone ----------------------------------------
    xs = rng.standard_normal((NN, 240, 320, 64)).astype(np.float32)
    timed("inorm_240x320x64",
          loop(lambda x: instance_norm(x.astype(jnp.float32)).astype(dt)), xs)

    # ---- raw conv ceilings ------------------------------------------
    def conv_bench(name, hw, cin, cout, k=3):
        xs = rng.standard_normal((NN, hw[0], hw[1], cin)).astype(np.float32)
        kern = jnp.asarray(
            rng.standard_normal((k, k, cin, cout)).astype(np.float32), dt
        )

        def apply(x):
            return jax.lax.conv_general_dilated(
                x.astype(dt), kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        fl = 2 * NN * hw[0] * hw[1] * cout * k * k * cin
        timed(name, loop(apply), xs, flops=fl)

    conv_bench("conv3x3_64_240x320", (240, 320), 64, 64)
    conv_bench("conv3x3_128_240x320", (240, 320), 128, 128)
    conv_bench("conv3x3_256_120x160", (120, 160), 256, 256)
    conv_bench("conv3x3_96_120x160", (120, 160), 96, 96)


if __name__ == "__main__":
    main()
