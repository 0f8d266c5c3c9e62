"""Same-session A/B: queries-per-chunk (default 8 vs 16; override with
a comma list as argv[2]) for the v4 slab lookup forward, per flagship
level, fori_loop slope timing."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bflow_tpu.ops.pallas import corr_lookup_v3 as v3

LEVELS = {
    "L0": (5, 60, 80),
    "L1": (2, 30, 40),
    "L2": (2, 15, 20),
    "L3": (2, 7, 10),
}


def slope(name, mk, *args, reps=(4, 12)):
    arrs = [jnp.asarray(a) for a in args]
    results = {}
    for R in reps:
        f = mk(R)
        out = f(jnp.float32(0.0), *arrs)
        jax.block_until_ready(out)
        float(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            v = float(f(jnp.float32(0.0), *arrs))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v), (name, v)
        results[R] = best
    r1, r2 = reps
    per = (results[r2] - results[r1]) / (r2 - r1) * 1e3
    print(f"{name:16s} {per:8.3f} ms/op")


def run_one(name, B=4, dtype=jnp.bfloat16, h1=60, w1=80, r=4):
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

    chs = (
        tuple(int(c) for c in sys.argv[2].split(","))
        if len(sys.argv) > 2
        else (8, 16)
    )
    for ch in chs:
        v3.pick_ch = lambda *a, ch=ch: ch
        slab = jax.jit(v3.to_slab)(vol)

        for ri in (None, 12, 20, 30):
            if ri is not None and h1 % ri:
                continue

            def mk(R, slab=slab, ri=ri):
                @jax.jit
                def f(acc, s, c):
                    def body(i, acc):
                        out = v3._fwd_impl(s, c + acc, r, False, ri)
                        return (
                            acc + out.astype(jnp.float32).sum() * 1e-20
                        )
                    return jax.lax.fori_loop(0, R, body, acc)
                return f

            slope(f"{name} ch={ch} ri={ri}", mk, slab, coords)


if __name__ == "__main__":
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else list(LEVELS)
    for n in names:
        run_one(n)
