"""v4 vs v5 lookup kernel, per flagship pyramid level, on the chip.

Slope-timed (scripts/_timing.py — the axon relay makes bare
block_until_ready loops meaningless). Shapes are the DSEC flagship
levels at the given per-level target-batch TN.

Usage: python scripts/bench_v5.py [B=16] [level ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


# (hl, wl, targets) per flagship level at 480x640, h1=60 w1=80
LEVELS = [(60, 80, 5), (30, 40, 2), (15, 20, 2), (7, 10, 2)]


def main() -> None:
    import jax
    import jax.numpy as jnp

    from _timing import slope_time_ms
    from bflow_tpu.ops.pallas import corr_lookup_v5 as v5
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab,
        lookup_level_slab_q8,
        quantize_slab,
        to_slab,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    only = set(int(a) for a in sys.argv[2:])
    h1, w1, r = 60, 80, 4
    rng = np.random.default_rng(0)

    for lvl, (hl, wl, T) in enumerate(LEVELS):
        if only and lvl not in only:
            continue
        TN = T * B
        hp = ((hl + 15) // 16) * 16
        # generate on device: a host-side array this size costs minutes
        # of numpy time + GBs over the relay link
        vol = jax.jit(
            lambda k: jax.random.normal(
                k, (TN, 1, h1, w1, hp, wl), jnp.bfloat16
            )
        )(jax.random.PRNGKey(lvl))
        # two coord regimes: 'rand' (uniform over the map — adversarial,
        # v5 fallback fires on most chunks) and 'smooth' (small in-row
        # spread — the production regime, flow fields are smooth)
        base = rng.uniform(0, max(hl - 3, 1), (TN, 1, h1, 1))
        coords_sets = {
            "rand": jnp.asarray(
                np.stack(
                    [rng.uniform(0, wl, (TN, 1, h1, w1)),
                     rng.uniform(0, hl, (TN, 1, h1, w1))], -1,
                ),
                jnp.float32,
            ),
            "smooth": jnp.asarray(
                np.stack(
                    [rng.uniform(0, wl, (TN, 1, h1, w1)),
                     base + rng.uniform(0, 3.0, (TN, 1, h1, w1))], -1,
                ),
                jnp.float32,
            ),
        }
        coords = coords_sets["rand"]
        slab = jax.jit(to_slab)(vol)
        del vol
        q, scale = jax.jit(quantize_slab)(slab)
        gb = slab.nbytes / 1e9
        print(f"# lvl{lvl} TN={TN} hp={hp} wl={wl} slab={gb:.2f}GB",
              flush=True)

        t4 = slope_time_ms(
            lambda c, s: lookup_level_slab(s, c, r), (coords, slab)
        )
        print(f"  v4 bf16       : {t4:7.2f} ms/iter", flush=True)
        for reg, cset in coords_sets.items():
            t5 = slope_time_ms(
                lambda c, s: v5.lookup_level_slab_v5(s, c, r),
                (cset, slab),
            )
            print(f"  v5 bf16 {reg:6s}: {t5:7.2f} ms/iter  "
                  f"({t4 / t5:.2f}x)", flush=True)
        t4q = slope_time_ms(
            lambda c, qq, ss: lookup_level_slab_q8(qq, ss, c, r),
            (coords, q, scale),
        )
        print(f"  v4 q8         : {t4q:7.2f} ms/iter", flush=True)
        for reg, cset in coords_sets.items():
            t5q = slope_time_ms(
                lambda c, qq, ss: v5.lookup_level_slab_q8_v5(qq, ss, c, r),
                (cset, q, scale),
            )
            print(f"  v5 q8   {reg:6s}: {t5q:7.2f} ms/iter  "
                  f"({t4q / t5q:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
