"""Sweep rows-per-program (ri) for the v4 slab lookup forward, per
flagship level, same-session A/B. Diagnoses whether the ~1 ms cost of
each SMALL pyramid level is per-program overhead (fewer, bigger
programs would win) or something else.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.ops.pallas.corr_lookup_v3 import _fwd_impl, to_slab

LEVELS = {
    "L0": (5, 60, 80),
    "L1": (2, 30, 40),
    "L2": (2, 15, 20),
    "L3": (2, 7, 10),
}


def run_one(name, B=4, dtype=jnp.bfloat16, h1=60, w1=80, r=4, K=16):
    Tl, hl, wl = LEVELS[name]
    hp16 = ((hl + 15) // 16) * 16
    rng = np.random.default_rng(0)

    @jax.jit
    def make_vol(key):
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
    per_row = slab.shape[3] * slab.shape[4] * slab.dtype.itemsize

    for ri in (None, 2, 3, 4, 6, 10, 12, 15, 20, 30, 60):
        if ri is not None and (h1 % ri or ri * per_row > 6_000_000):
            continue
        f = jax.jit(
            lambda v, c, ri=ri: _fwd_impl(v, c, r, False, ri)
            .astype(jnp.float32).sum()
        )
        s = float(f(slab, coords))
        assert np.isfinite(s)
        best = np.inf
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                f(slab, coords)
            float(f(slab, coords))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{name} ri={ri}: {best*1e3:7.3f} ms "
              f"({ri and per_row*ri/1e6 or 0:.2f} MB/program)")


if __name__ == "__main__":
    import sys

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(LEVELS)
    for n in names:
        run_one(n)
