"""Probe: can mosaic lower per-query dynamic patch extraction, and how
fast is it at the flagship level-0 shape?

The round-5 lookup redesign (v6) replaces v4's hat-matmul windowing
with the frac-lerp identity: all (2r+1)^2 bilinear taps of one query
share a single fractional part, so the window is a 4-tap lerp of an
INTEGER-ALIGNED (win+1)^2 patch of the query's map. The per-chunk hat
matmuls and band copies disappear; what remains is one dynamic patch
extraction per query plus fully vectorized lerps.

This probe measures the extraction primitive candidates in isolation on
the real chip, at level-0 geometry (hp=64, w1p=80, wlp=80, 8-query
chunks, ri=6 rows/program):

  A: two-dim dynamic slice   vol[pl.ds(fy,16), pl.ds(q*wlp+fx,16)]
  B: dyn-sublane slice + dynamic lane roll
     strip = vol[pl.ds(fy,16), band]; pltpu.roll(strip, -fx, axis=1)
  C: v4 baseline shape of work (8 static band copies + 2 matmuls) for
     scale (NOT the real v4 — see corr_lookup_v3 for that).

Each kernel reads the same slab block and writes a (16, w1p*16) packed
tile per row; correctness of A/B is checked against a numpy oracle.

Usage: python scripts/exp_extract_probe.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HP = 64
W1P = 80
WLP = 80
RI = 1
H1 = 60
TN = 20  # Tl*N at flagship B=4 level 0
PATCH = 16


def _kernel_a(idx_ref, vol_ref, out_ref):
    # idx: (1, ri, w1p, 2) int32 in SMEM: (fy, fx) per query
    for rl in range(RI):
        for q in range(W1P):
            fy = idx_ref[0, rl, q, 0]
            fx = idx_ref[0, rl, q, 1]
            out_ref[0, rl, :, q * PATCH : (q + 1) * PATCH] = vol_ref[
                0, rl, pl.ds(fy, PATCH), pl.ds(q * WLP + fx, PATCH)
            ]


def _kernel_b(idx_ref, vol_ref, out_ref):
    for rl in range(RI):
        for q in range(W1P):
            fy = idx_ref[0, rl, q, 0]
            fx = idx_ref[0, rl, q, 1]
            strip = vol_ref[
                0, rl, pl.ds(fy, PATCH), q * WLP : (q + 1) * WLP
            ]
            rolled = pltpu.roll(strip, -fx, axis=1)
            out_ref[0, rl, :, q * PATCH : (q + 1) * PATCH] = rolled[
                :, :PATCH
            ]


def _run(kernel, idx, vol):
    return pl.pallas_call(
        kernel,
        grid=(TN, H1 // RI),
        in_specs=[
            pl.BlockSpec(
                (1, RI, W1P, 2),
                lambda t, i: (t, i, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, RI, HP, W1P * WLP),
                lambda t, i: (t, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, RI, PATCH, W1P * PATCH),
            lambda t, i: (t, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (TN, H1, PATCH, W1P * PATCH), jnp.bfloat16
        ),
    )(idx, vol)


def main() -> None:
    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.standard_normal((TN, H1, HP, W1P * WLP)), jnp.bfloat16
    )
    fy = rng.integers(0, HP - PATCH + 1, (TN, H1, W1P))
    fx = rng.integers(0, WLP - PATCH + 1, (TN, H1, W1P))
    idx = jnp.asarray(np.stack([fy, fx], axis=-1), jnp.int32)

    voln = np.asarray(vol, np.float32)
    want = np.zeros((TN, H1, PATCH, W1P * PATCH), np.float32)
    for q in range(W1P):
        for t in range(TN):
            for r in range(H1):
                y0, x0 = fy[t, r, q], fx[t, r, q]
                want[t, r, :, q * PATCH : (q + 1) * PATCH] = voln[
                    t, r, y0 : y0 + PATCH,
                    q * WLP + x0 : q * WLP + x0 + PATCH,
                ]

    for tag, kern in (("A 2d-ds", _kernel_a), ("B ds+roll", _kernel_b)):
        try:
            f = jax.jit(functools.partial(_run, kern))
            out = np.asarray(f(idx, vol), np.float32)
            err = np.abs(out - want).max()
            # timing
            f(idx, vol).block_until_ready()
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                out = f(idx, vol)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / n
            print(f"{tag}: err={err:.1e}  {dt*1e3:.3f} ms "
                  f"({dt*1e9/(TN*H1*W1P):.1f} ns/query)")
        except Exception as e:  # noqa: BLE001
            msg = str(e).splitlines()[0][:160]
            print(f"{tag}: FAILED {type(e).__name__}: {msg}")


if __name__ == "__main__":
    main()
