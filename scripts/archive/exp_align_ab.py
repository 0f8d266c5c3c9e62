"""Same-session A/B: lane-aligned (wlp=128) vs compact (wlp=80) slab
bands at the flagship level-0 shape.

Hypothesis: the per-chunk band-gather copies in the v4 kernel
(corr_lookup_v3._fwd_kernel) are lane-UNALIGNED when wlp=80 (band q
starts at lane 80*q), forcing Mosaic into lane-rotation lowering; at
wlp=128 every band starts on a vreg boundary. The aligned layout costs
1.6x HBM in bf16 (a wash at best) but only 0.8x of today's bf16 bytes
in int8 — if alignment wins, q8+wlp128 beats both.

Measures the standalone level-0 lookup (fwd) at the DSEC flagship
shape for {bf16, q8} x {wlp 80, 128}.

Usage: python scripts/exp_align_ab.py [TN=20]

(Round-4 erratum: this script originally timed with block_until_ready
loops, which the axon relay turns into dispatch-only timing — its
round-3/4 numbers are void. Now uses scripts/_timing.py slope timing.)
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab,
        lookup_level_slab_q8,
        quantize_slab,
        to_slab,
    )

    TN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    h1, w1, hl, wl, r = 60, 80, 60, 80, 4  # flagship level 0 (hp=64)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.standard_normal((TN, 1, h1, w1, 64, wl)), jnp.bfloat16
    )
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(0, wl, (TN, 1, h1, w1)),
             rng.uniform(0, hl, (TN, 1, h1, w1))], -1,
        ),
        jnp.float32,
    )

    from _timing import slope_time_ms

    def bench(fn, *args):
        # coords must be the perturbed (first) arg for slope timing
        return slope_time_ms(
            lambda c, *rest: fn(*rest, c), (args[-1],) + args[:-1]
        ) / 1e3

    for wlp in (80, 128):
        slab = to_slab(vol, wlp=wlp)
        t = bench(lambda s, c: lookup_level_slab(s, c, r), slab, coords)
        print(f"bf16 wlp={wlp}: {t*1e3:.2f} ms "
              f"({slab.nbytes/1e6:.0f} MB slab)", flush=True)
        q, scale = quantize_slab(slab)
        tq = bench(
            lambda qq, ss, c: lookup_level_slab_q8(qq, ss, c, r),
            q, scale, coords,
        )
        print(f"q8   wlp={wlp}: {tq*1e3:.2f} ms "
              f"({q.nbytes/1e6:.0f} MB slab)", flush=True)


if __name__ == "__main__":
    main()
