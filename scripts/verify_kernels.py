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
    from bflow_tpu.ops.pallas.corr_lookup import lookup_level_pallas
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

        def f_pal(v, c):
            return (lookup_level_pallas(v, c, cfg.radius) * gvec).sum()

        def f_v4(v, c):
            return (
                lookup_level_slab(to_slab(v), c, cfg.radius) * gvec
            ).sum()

        def f_ref(v, c):
            return (_lookup_level_gather(v, c, cfg.radius) * gvec).sum()

        out_p = jax.jit(
            lambda v, c: lookup_level_pallas(v, c, cfg.radius)
        )(vol, coords)
        out_4 = jax.jit(
            lambda v, c: lookup_level_slab(to_slab(v), c, cfg.radius)
        )(vol, coords)
        out_g = jax.jit(
            lambda v, c: _lookup_level_gather(v, c, cfg.radius)
        )(vol, coords)
        dv_p, dc_p = jax.jit(jax.grad(f_pal, argnums=(0, 1)))(vol, coords)
        dv_4, dc_4 = jax.jit(jax.grad(f_v4, argnums=(0, 1)))(vol, coords)
        dv_g, dc_g = jax.jit(jax.grad(f_ref, argnums=(0, 1)))(vol, coords)

        def err(a, b):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            den = np.maximum(np.abs(b).max(), 1e-12)
            return np.abs(a - b).max(), np.abs(a - b).max() / den

        for tag, (e_fwd, e_dv, e_dc) in (
            ("v2", (err(out_p, out_g), err(dv_p, dv_g), err(dc_p, dc_g))),
            ("v4", (err(out_4, out_g), err(dv_4, dv_g), err(dc_4, dc_g))),
        ):
            print(
                f"level {lvl} {tag} vol{tuple(vol.shape)}: "
                f"fwd abs={e_fwd[0]:.2e} rel={e_fwd[1]:.2e}  "
                f"dvol abs={e_dv[0]:.2e} rel={e_dv[1]:.2e}  "
                f"dcoords abs={e_dc[0]:.2e} rel={e_dc[1]:.2e}"
            )
            ok &= e_fwd[1] < 1e-5 and e_dv[1] < 1e-5 and e_dc[1] < 1e-4

    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
