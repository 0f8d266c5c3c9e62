"""Microbench: correlation-volume build variants on TPU (scratch)."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    T, N, h, w, D = 5, 4, 60, 80, 256
    rng = np.random.default_rng(0)
    fr = jnp.asarray(rng.standard_normal((T, N, h, w, D)), jnp.float32)
    ft = jnp.asarray(rng.standard_normal((T, N, h, w, D)), jnp.float32)

    def timed(name, fn, *args, reps=(4, 12)):
        res = {}
        for R in reps:
            f = fn(R)
            out = f(jnp.float32(0.0), *args)
            jax.block_until_ready(out)
            float(out)
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.0), *args))
            res[R] = time.perf_counter() - t0
            assert np.isfinite(v)
        r1, r2 = reps
        print(f"{name:28s} {(res[r2]-res[r1])/(r2-r1)*1e3:8.2f} ms")

    def wrap(body):
        def make(R):
            @jax.jit
            def f(acc, fr, ft):
                def it(i, acc):
                    out = body(fr + acc, ft)
                    return acc + out.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, it, acc)
            return f
        return make

    # v1: current bf16 path
    def v1(fr, ft):
        a = fr.reshape(T, N, h * w, D)
        b = ft.reshape(T, N, h * w, D)
        a = (a / jnp.sqrt(jnp.float32(D))).astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jnp.einsum("tnqd,tnkd->tnqk", a, b,
                          preferred_element_type=jnp.bfloat16)

    timed("v1_einsum_bf16", wrap(v1), fr, ft)

    # v2: merge T,N into one batch dim
    def v2(fr, ft):
        a = (fr.reshape(T * N, h * w, D) / 16.0).astype(jnp.bfloat16)
        b = ft.reshape(T * N, h * w, D).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)

    timed("v2_dot_general_merged", wrap(v2), fr, ft)

    # v3: f32 accumulate then cast
    def v3(fr, ft):
        a = (fr.reshape(T * N, h * w, D) / 16.0).astype(jnp.bfloat16)
        b = ft.reshape(T * N, h * w, D).astype(jnp.bfloat16)
        out = jax.lax.dot_general(
            a, b, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        return out.astype(jnp.bfloat16)

    timed("v3_f32acc_cast", wrap(v3), fr, ft)

    # v4: pre-transpose rhs to (B, D, hw) so contraction is dim 1
    def v4(fr, ft):
        a = (fr.reshape(T * N, h * w, D) / 16.0).astype(jnp.bfloat16)
        b = ft.reshape(T * N, h * w, D).transpose(0, 2, 1).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.bfloat16)

    timed("v4_rhs_T", wrap(v4), fr, ft)

    # v5: full pyramid (current code) for reference
    from bflow_tpu.models.corr import build_corr_pyramid

    def v5(fr, ft):
        pyr = build_corr_pyramid(fr, ft, (1, 1, 1, 4, 4), precision="bfloat16")
        return sum(v.astype(jnp.float32).sum() for _, v in pyr) * 0 + pyr[0][1].astype(jnp.float32).sum()

    timed("v5_full_pyramid", wrap(v5), fr, ft)

    # v6: pyramid pooling only (from a prebuilt volume)
    vol0 = jax.jit(v1)(fr, ft).reshape(T, N, h, w, h, w)
    jax.block_until_ready(vol0)

    def mk_pool(R):
        from bflow_tpu.models.corr import _avg_pool_2x2

        @jax.jit
        def f(acc, vol):
            def it(i, acc):
                v1 = _avg_pool_2x2(vol + acc.astype(vol.dtype))
                sel = v1[jnp.asarray((3, 4))]
                v2 = _avg_pool_2x2(sel)
                v3 = _avg_pool_2x2(v2)
                return acc + (v1.astype(jnp.float32).sum()
                              + v3.astype(jnp.float32).sum()) * 1e-20
            return jax.lax.fori_loop(0, R, it, acc)
        return f

    def timed2(name, make, *args, reps=(4, 12)):
        res = {}
        for R in reps:
            f = make(R)
            out = f(jnp.float32(0.0), *args)
            float(out)
            t0 = time.perf_counter()
            float(f(jnp.float32(0.0), *args))
            res[R] = time.perf_counter() - t0
        r1, r2 = reps
        print(f"{name:28s} {(res[r2]-res[r1])/(r2-r1)*1e3:8.2f} ms")

    timed2("v6_pooling_only", mk_pool, vol0)


if __name__ == "__main__":
    main()
