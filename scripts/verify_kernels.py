"""On-TPU exactness check of the pallas lookup at production shapes.

Re-runs the pallas-vs-gather fwd/VJP comparisons on the real backend
(tests/test_corr.py covers interpret mode only) and prints max abs/rel
errors per pyramid level. Run after any kernel edit (VERDICT r1 #10).

Usage: python scripts/verify_kernels.py [batch=2]
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from __graft_entry__ import _flagship_config
    from bflow_tpu.models.corr import (
        _lookup_level_gather,
        build_corr_pyramid,
    )
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab,
        to_slab,
    )
    from bflow_tpu.ops.sampler import coords_grid

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cfg = _flagship_config()
    T, D = cfg.num_targets, cfg.feature_dim
    h1, w1 = 60, 80
    rng = np.random.default_rng(7)

    fr = jnp.asarray(
        rng.standard_normal((T, N, h1, w1, D)), jnp.float32
    ) * 0.5
    ft = jnp.asarray(
        rng.standard_normal((T, N, h1, w1, D)), jnp.float32
    ) * 0.5

    # f32 pyramid: the exactness comparison must not be drowned in bf16
    # volume rounding (bf16 parity is covered end-to-end by bench/tests)
    pyramid = jax.jit(
        lambda a, b: build_corr_pyramid(a, b, cfg.levels_per_target)
    )(fr, ft)

    base = np.asarray(coords_grid(N, h1, w1))
    ok = True
    for lvl, (idx, vol) in enumerate(pyramid):
        Tl = len(idx)
        coords = jnp.asarray(
            (base[None] / 2.0**lvl)
            + rng.uniform(-9, 9, (Tl, N, h1, w1, 2)).astype(np.float32)
        )
        gvec = jnp.asarray(
            rng.standard_normal(
                (Tl, N, h1, w1, (2 * cfg.radius + 1) ** 2)
            ),
            jnp.float32,
        )

        def f_v4(v, c):
            return (
                lookup_level_slab(to_slab(v), c, cfg.radius) * gvec
            ).sum()

        def f_ref(v, c):
            return (_lookup_level_gather(v, c, cfg.radius) * gvec).sum()

        out_4 = jax.jit(
            lambda v, c: lookup_level_slab(to_slab(v), c, cfg.radius)
        )(vol, coords)
        out_g = jax.jit(
            lambda v, c: _lookup_level_gather(v, c, cfg.radius)
        )(vol, coords)
        dv_4, dc_4 = jax.jit(jax.grad(f_v4, argnums=(0, 1)))(vol, coords)
        dv_g, dc_g = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(vol, coords)

        def err(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            den = np.maximum(np.abs(b).max(), 1e-12)
            return np.abs(a - b).max(), np.abs(a - b).max() / den

        for tag, (e_fwd, e_dv, e_dc) in (
            ("v4", (err(out_4, out_g), err(dv_4, dv_g), err(dc_4, dc_g))),
        ):
            print(
                f"level {lvl} {tag} vol{tuple(vol.shape)}: "
                f"fwd abs={e_fwd[0]:.2e} rel={e_fwd[1]:.2e}  "
                f"dvol abs={e_dv[0]:.2e} rel={e_dv[1]:.2e}  "
                f"dcoords abs={e_dc[0]:.2e} rel={e_dc[1]:.2e}"
            )
            ok &= e_fwd[1] < 1e-5 and e_dv[1] < 1e-5 and e_dc[1] < 1e-4

    # --- int8 slab lookup (forward-only): quantization-bounded ------
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab_q8,
        quantize_volume,
    )

    idx0, vol0 = pyramid[0]
    coords = jnp.asarray(
        (base[None])
        + rng.uniform(-9, 9, (len(idx0), N, h1, w1, 2)).astype(np.float32)
    )
    q, scale = jax.jit(quantize_volume)(vol0)
    out_q = jax.jit(
        lambda q, s, c: lookup_level_slab_q8(to_slab(q), s, c, cfg.radius)
    )(q, scale, coords)
    out_g = jax.jit(
        lambda v, c: _lookup_level_gather(v, c, cfg.radius)
    )(vol0, coords)
    e = err(out_q, out_g)
    print(f"q8 lookup level 0: fwd abs={e[0]:.2e} rel={e[1]:.2e}")
    ok &= e[1] < 2e-2

    # --- stem + generalized conv kernels (bf16, vs XLA bf16 conv) ---
    from bflow_tpu.ops.pallas.conv3x3 import _conv_xla, conv2d_pallas
    from bflow_tpu.ops.pallas.stem_conv import _stem_xla, stem_conv_pallas

    x = jnp.asarray(
        rng.standard_normal((2, 480, 640, 15)), jnp.bfloat16
    )
    k = jnp.asarray(rng.standard_normal((7, 7, 15, 64)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64) * 0.1, jnp.float32)
    e = err(jax.jit(stem_conv_pallas)(x, k, b),
            jax.jit(_stem_xla)(x, k, b))
    print(f"stem 480x640x15: fwd abs={e[0]:.2e} rel={e[1]:.2e}")
    ok &= e[1] < 2e-2

    from bflow_tpu.ops.pallas.stem_conv import supported as stem_supported

    for (n, h, w, c, o) in ((2, 240, 320, 64, 96), (2, 120, 160, 96, 128),
                            (2, 92, 124, 96, 128)):  # stage-s2 + MultiFlow
        if not stem_supported((n, h, w, c), jnp.bfloat16, 3, 3):
            # production dispatch gates on supported(); e.g. MultiFlow
            # hs=46 has no valid row block (stem_conv._pick_ri)
            print(f"s2 conv 3x3 {n}x{h}x{w}x{c}->{o}: skipped "
                  "(shape outside kernel gate; XLA conv is used there)")
            continue
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, c, o)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)
        e = err(jax.jit(stem_conv_pallas)(x, k, b),
                jax.jit(_stem_xla)(x, k, b))
        print(f"s2 conv 3x3 {n}x{h}x{w}x{c}->{o}: "
              f"fwd abs={e[0]:.2e} rel={e[1]:.2e}")
        ok &= e[1] < 2e-2

    for (n, h, w, c, o, kh, kw) in (
        (2, 240, 320, 64, 64, 3, 3),
        (2, 60, 80, 384, 384, 1, 5),
        (2, 60, 80, 384, 384, 5, 1),
        (2, 60, 80, 256, 192, 3, 3),
        (2, 60, 80, 4, 128, 7, 7),
        (2, 46, 62, 128, 128, 3, 3),  # MultiFlow 1/8-res shapes
    ):
        x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((kh, kw, c, o)) * 0.1,
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal(o) * 0.1, jnp.float32)
        e = err(jax.jit(conv2d_pallas)(x, k, b),
                jax.jit(_conv_xla)(x, k, b))
        print(f"conv {kh}x{kw} {n}x{h}x{w}x{c}->{o}: "
              f"fwd abs={e[0]:.2e} rel={e[1]:.2e}")
        ok &= e[1] < 2e-2

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
