"""Follow-up encoder experiments: stem variants, channel padding, norms.

Usage: python scripts/exp_encoder2.py [batch=4] [stage ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bflow_tpu.models.extractor import StemConv, instance_norm

    args = sys.argv[1:]
    N = int(args[0]) if args and args[0].isdigit() else 4
    only = set(a for a in args if not a.isdigit())
    NN = 5 * N
    H, W = 480, 640
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    print(f"# encoder exp2: stacked batch={NN}, backend={jax.default_backend()}")

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
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                v = float(fn(jnp.float32(0.0), *arrs))
                best = min(best, time.perf_counter() - t0)
                assert np.isfinite(v), (name, v)
            res[R] = best
        r1, r2 = reps
        per = (res[r2] - res[r1]) / (r2 - r1) * 1e3
        eff = f"  {flops / (per * 1e-3) / 1e12:6.1f} TFLOP/s" if flops else ""
        print(f"{name:24s} {per:8.2f} ms/op{eff}")
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

    x0 = rng.standard_normal((NN, H, W, 15)).astype(np.float32)
    stem_fl = 2 * NN * (H // 2) * (W // 2) * 64 * 49 * 15

    # stem: s2d rewrite vs direct strided 7x7
    for s2d in (True, False):
        stem = StemConv(64, dtype=dt, use_s2d=s2d)
        vs = stem.init(key, x0[:1])
        timed(f"stem_s2d={s2d}", loop(lambda x, s=stem, v=vs: s.apply(v, x)),
              x0, flops=stem_fl)

    # s2d conv alone on a pre-transformed input (isolate the transform)
    xs2d = rng.standard_normal((NN, 240, 320, 60)).astype(np.float32)
    k44 = jnp.asarray(rng.standard_normal((4, 4, 60, 64)), dt)

    def conv44(x):
        return jax.lax.conv_general_dilated(
            x.astype(dt), k44, (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    timed("s2d_conv_only", loop(conv44), xs2d, flops=stem_fl)

    def s2d_only(x):
        n, h, w, c = x.shape
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        return xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, h // 2, w // 2, 4 * c
        ).astype(dt)

    timed("s2d_transform_only", loop(s2d_only), x0)

    # raw 3x3 convs: 64 and 96 channels, plus the pad-to-128 trick
    def conv_bench(name, hw, cin, cout, pad_to=None):
        xs = rng.standard_normal((NN, hw[0], hw[1], cin)).astype(np.float32)
        ci = pad_to or cin
        co = pad_to or cout
        kern = jnp.asarray(rng.standard_normal((3, 3, ci, co)), dt)

        def apply(x):
            x = x.astype(dt)
            if pad_to:
                x = jnp.pad(x, ((0, 0),) * 3 + ((0, pad_to - cin),))
            out = jax.lax.conv_general_dilated(
                x, kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out[..., :cout] if pad_to else out

        fl = 2 * NN * hw[0] * hw[1] * cout * 9 * cin
        timed(name, loop(apply), xs, flops=fl)

    conv_bench("conv3x3_64_240x320", (240, 320), 64, 64)
    conv_bench("conv3x3_64pad128", (240, 320), 64, 64, pad_to=128)
    conv_bench("conv3x3_96_120x160", (120, 160), 96, 96)
    conv_bench("conv3x3_96pad128", (120, 160), 96, 96, pad_to=128)

    # instance norm: current f32 cast vs bf16-input f32-accumulation
    xs = rng.standard_normal((NN, 240, 320, 64)).astype(np.float32)

    def inorm_bf16(x):
        x = x.astype(dt)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(x.astype(jnp.float32) - mean), axis=(1, 2),
            keepdims=True,
        )
        return ((x.astype(jnp.float32) - mean)
                * jax.lax.rsqrt(var + 1e-5)).astype(dt)

    timed("inorm_f32cast", loop(
        lambda x: instance_norm(x.astype(jnp.float32)).astype(dt)), xs)
    timed("inorm_bf16in", loop(inorm_bf16), xs)


if __name__ == "__main__":
    main()
