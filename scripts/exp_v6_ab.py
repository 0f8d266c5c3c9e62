"""On-chip A/B: v6 (roll-extract x side) vs v4 (hat-matmul x side).

Measures the forward lookup at the flagship pyramid's level shapes and
verifies v6 bit-grade agreement against v4 on the chip (interpret-mode
equality is necessary but mosaic lowering bugs only show on hardware —
the round-4 q8 lesson).

Usage: python scripts/exp_v6_ab.py [TN=20]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


# flagship DSEC E_I levels at B=4 (Tl*N = 20 at level 0; deeper levels
# keep all 5 targets for the first level only — see corr.py
# level_target_indices([1,1,1,4,4]) -> 5,2,2,2 targets)
LEVELS = [
    # (TN_scale, hl, wl)
    (1.0, 60, 80),
    (0.4, 30, 40),
    (0.4, 15, 20),
    (0.4, 7, 10),
]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from _timing import slope_time_ms
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab,
        to_slab,
    )

    TN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    h1, w1, r = 60, 80, 4
    rng = np.random.default_rng(0)

    total = {"v4": 0.0, "v6": 0.0}
    for scale, hl, wl in LEVELS:
        tn = max(1, int(round(TN * scale)))
        hp = ((hl + 15) // 16) * 16
        vol = jax.jit(
            lambda k: jax.random.normal(
                k, (tn, 1, h1, w1, hp, wl), jnp.bfloat16
            ),
            static_argnums=(),
        )(jax.random.PRNGKey(hl))
        slab = jax.jit(to_slab)(vol)
        coords = jnp.asarray(
            np.stack([rng.uniform(-2, wl + 2, (tn, 1, h1, w1)),
                      rng.uniform(-2, hl + 2, (tn, 1, h1, w1))], -1),
            jnp.float32,
        )

        outs = {}
        for tag, env in (("v4", "0"), ("v6", "1")):
            os.environ["BFLOW_LOOKUP_V6"] = env
            t = slope_time_ms(
                lambda c, s: lookup_level_slab(s, c, r), (coords, slab)
            )
            outs[tag] = np.asarray(
                jax.jit(lambda c, s: lookup_level_slab(s, c, r))(
                    coords, slab
                ),
                np.float32,
            )
            total[tag] += t
            print(f"  L(hl={hl:3d},wl={wl:3d},tn={tn:3d}) {tag}: "
                  f"{t:7.3f} ms/iter", flush=True)
        err = np.abs(outs["v4"] - outs["v6"]).max()
        print(f"  L(hl={hl:3d}) v6 vs v4 on-chip max|d| = {err:.2e}",
              flush=True)
        assert err < 1e-2, err
    print(f"TOTAL v4 {total['v4']:.3f} ms/iter  v6 {total['v6']:.3f} "
          f"ms/iter  ({total['v4'] / max(total['v6'], 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
