"""Per-level lookup kernel A/B: v3 slab vs v2 block-diagonal.

Times ONE pyramid level's kernel in isolation (sum-consumed), async
K-dispatch + single readback. Flagship level shapes:
  L0: Tl=5 hl=60 wl=80   L1: Tl=2 hl=30 wl=40
  L2: Tl=2 hl=15 wl=20   L3: Tl=2 hl=7  wl=10
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.ops.pallas.corr_lookup import lookup_level_pallas
from bflow_tpu.ops.pallas.corr_lookup_v3 import lookup_level_slab, to_slab

LEVELS = {
    "L0": (5, 60, 80),
    "L1": (2, 30, 40),
    "L2": (2, 15, 20),
    "L3": (2, 7, 10),
}


def run_one(name, B, dtype, h1=60, w1=80, r=4, K=16):
    Tl, hl, wl = LEVELS[name]
    hp16 = ((hl + 15) // 16) * 16
    rng = np.random.default_rng(0)

    @jax.jit
    def make_vol(key):
        # generate ON DEVICE: a host array this size would crawl
        # through the relay tunnel for minutes
        v = jax.random.normal(
            key, (Tl, B, h1, w1, hp16, wl), jnp.float32
        )
        return v.at[..., hl:, :].set(0.0).astype(dtype)

    vol = make_vol(jax.random.PRNGKey(0))
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(0, wl, (Tl, B, h1, w1)),
             rng.uniform(0, hl, (Tl, B, h1, w1))], -1
        ),
        jnp.float32,
    )
    slab = jax.jit(to_slab)(vol)

    f3 = jax.jit(
        lambda v, c: lookup_level_slab(v, c, r)
        .astype(jnp.float32).sum()
    )
    f2 = jax.jit(
        lambda v, c: lookup_level_pallas(v, c, r)
        .astype(jnp.float32).sum()
    )

    for label, f, v in (("v3", f3, slab), ("v2", f2, vol)):
        s = float(f(v, coords))
        assert np.isfinite(s)
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                f(v, coords)
            float(f(v, coords))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{name} {label} B={B}: {best*1e3:7.3f} ms")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="L0,L1,L2,L3")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--f32", action="store_true")
    args = ap.parse_args()
    dt = jnp.float32 if args.f32 else jnp.bfloat16
    for name in args.levels.split(","):
        run_one(name, args.batch, dt)
