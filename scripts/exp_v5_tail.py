"""Isolate v5's slowdown: tail vs rebase vs branches.

Times at the flagship level-0 shape (TN arg):
  v4            — baseline kernel
  v5 K=64       — monkeypatched K_BAND=hp: static whole-band slice,
                  no rebase, no fallback branches => measures the
                  mask+selector TAIL alone vs v4's per-query copies
  v5 K=32 smooth— production v5 (rebased dynamic slice + rare branch)
  v5 K=32 rand  — fallback-heavy coords

Usage: python scripts/exp_v5_tail.py [TN=20]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from _timing import slope_time_ms
    from bflow_tpu.ops.pallas import corr_lookup_v5 as v5
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab,
        to_slab,
    )

    TN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    h1, w1, hl, wl, r = 60, 80, 60, 80, 4
    hp = 64
    rng = np.random.default_rng(0)

    vol = jax.jit(
        lambda k: jax.random.normal(k, (TN, 1, h1, w1, hp, wl),
                                    jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    slab = jax.jit(to_slab)(vol)
    base = rng.uniform(0, hl - 3, (TN, 1, h1, 1))
    coords_rand = jnp.asarray(
        np.stack([rng.uniform(0, wl, (TN, 1, h1, w1)),
                  rng.uniform(0, hl, (TN, 1, h1, w1))], -1), jnp.float32
    )
    coords_smooth = jnp.asarray(
        np.stack([rng.uniform(0, wl, (TN, 1, h1, w1)),
                  base + rng.uniform(0, 3.0, (TN, 1, h1, w1))], -1),
        jnp.float32,
    )

    t4 = slope_time_ms(lambda c, s: lookup_level_slab(s, c, r),
                       (coords_rand, slab))
    print(f"v4            : {t4:7.2f} ms/iter", flush=True)

    v5.K_BAND = 64  # static whole-band: tail-only delta
    t = slope_time_ms(lambda c, s: v5.lookup_level_slab_v5(s, c, r),
                      (coords_rand, slab))
    print(f"v5 K=64 tail  : {t:7.2f} ms/iter  ({t4 / t:.2f}x)", flush=True)

    v5.K_BAND = 32
    t = slope_time_ms(lambda c, s: v5.lookup_level_slab_v5(s, c, r),
                      (coords_smooth, slab))
    print(f"v5 K=32 smooth: {t:7.2f} ms/iter  ({t4 / t:.2f}x)", flush=True)
    t = slope_time_ms(lambda c, s: v5.lookup_level_slab_v5(s, c, r),
                      (coords_rand, slab))
    print(f"v5 K=32 rand  : {t:7.2f} ms/iter  ({t4 / t:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
