"""Cycle attribution for the v4 slab lookup kernel (corr_lookup_v3).

The kernel is issue-bound (~400 ns per 8-query chunk at L0 flagship
shapes vs ~100 ns of HBM stream). This experiment times ablated kernel
variants (each produces WRONG numbers — timing only) to attribute the
per-chunk cycles:

  full      — the production forward kernel
  nocopy    — band gather (8 misaligned (16,wlp) copies) removed
  nodiag    — diagonal (16,16) pack removed (store raw out rows)
  nomm2     — second matmul removed (d_scr from s2 directly)
  nomm1     — y-blend matmul removed (rp = ey2-broadcast junk)
  streamonly— all compute removed; just touch the block + store zeros

Timing: the axon relay makes block_until_ready a no-op, so each
variant runs R times inside one jitted lax.fori_loop (coords perturbed
by the carry) and the per-op cost is the slope between two R values —
the perf_breakdown.py method.

Usage: python scripts/exp_v5_attrib.py [TN=20] [level=0]
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from bflow_tpu.ops.pallas import corr_lookup_v3 as v3

    TN = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    lvl = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    h1, w1 = 60, 80
    hl, wl = max(h1 >> lvl, 1), max(w1 >> lvl, 1)
    if lvl >= 2:  # truncating pool
        hl, wl = [60, 30, 15, 7][lvl], [80, 40, 20, 10][lvl]
    r = 4

    rng = np.random.default_rng(0)
    vol = jnp.asarray(
        rng.standard_normal(
            (TN, 1, h1, w1, v3._round_up(hl, 16), wl), dtype=np.float32
        ),
        jnp.bfloat16,
    )
    coords = jnp.asarray(
        np.stack(
            [rng.uniform(0, wl, (TN, 1, h1, w1)),
             rng.uniform(0, hl, (TN, 1, h1, w1))], -1,
        ),
        jnp.float32,
    )
    slab = jax.jit(v3.to_slab)(vol)
    Tl, N, _, hp, lanes = slab.shape
    ch, w1p, wlp = v3._resolve_chunking(w1, lanes)
    win = 2 * r + 1
    print(f"# TN={TN} lvl={lvl} hl={hl} wl={wl} hp={hp} wlp={wlp} ch={ch} "
          f"slab={slab.nbytes/1e6:.0f}MB")

    def make_kernel(variant):
        def kern(xp_ref, yc_ref, vol_ref, out_ref, s2_scr, d_scr, *,
                 w1p, win, hp, wlp, ri, ch):
            dt = vol_ref.dtype
            prec = v3._precision(dt)
            nch = w1p // ch
            cb = ch * wlp
            cw = ch * v3.WINP

            def yblend(rl, c):
                yv = yc_ref[0, rl, :, c : c + 1]
                ey2 = v3._hat(yv, hp, 1).astype(dt)
                band = vol_ref[0, rl, :, c * cb : (c + 1) * cb]
                if variant == "nomm1":
                    # touch band + ey2 without the MXU contraction
                    return (
                        jnp.broadcast_to(band[0:1, :], (cw, cb))
                        * ey2[:, 0:1]
                    )
                return jax.lax.dot_general(
                    ey2, band, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                ).astype(dt)

            if variant == "streamonly":
                acc = jnp.zeros((v3.WINP, cw), dt)
                for rl in range(ri):
                    for c in range(nch):
                        band = vol_ref[0, rl, :, c * cb : (c + 1) * cb]
                        acc = acc + band[0 : v3.WINP, 0:cw]
                        out_ref[0, rl, c] = acc
                return

            rp = yblend(0, 0)
            for rl in range(ri):
                exT = v3._hat(xp_ref[0, rl], wlp, 0).astype(dt)
                for c in range(nch):
                    nrl, nc = (rl, c + 1) if c + 1 < nch else (rl + 1, 0)
                    rp_next = yblend(nrl, nc) if nrl < ri else None
                    if variant == "nocopy":
                        s2 = rp[:, 0:wlp]
                    else:
                        for ql in range(ch):
                            s2_scr[ql * v3.WINP : (ql + 1) * v3.WINP, :] = rp[
                                ql * v3.WINP : (ql + 1) * v3.WINP,
                                ql * wlp : (ql + 1) * wlp,
                            ]
                        s2 = s2_scr[:]
                    if variant == "nomm2":
                        out_ref[0, rl, c] = jnp.pad(s2[0 : v3.WINP, :], ((0, 0), (0, cw - s2.shape[1])))
                        rp = rp_next
                        continue
                    out = jax.lax.dot_general(
                        s2, exT[:, c * cw : (c + 1) * cw],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec,
                    )
                    if variant == "nodiag":
                        out_ref[0, rl, c] = out[0 : v3.WINP, :].astype(dt)
                    else:
                        for ql in range(ch):
                            s = ql * v3.WINP
                            d_scr[:, s : s + v3.WINP] = out[
                                s : s + v3.WINP, s : s + v3.WINP
                            ].astype(dt)
                        out_ref[0, rl, c] = d_scr[:]
                    rp = rp_next

        return kern

    volr_host = slab.reshape(Tl * N, h1, hp, lanes)
    ri = v3._pick_ri(h1, hp * lanes * slab.dtype.itemsize)

    def build(variant):
        nch = w1p // ch

        def run(c, volr):
            xp, yc = v3._prep_positions(
                c.reshape(Tl * N, h1, w1, 2), r, w1p, ch
            )
            return pl.pallas_call(
                functools.partial(
                    make_kernel(variant), w1p=w1p, win=win, hp=hp,
                    wlp=wlp, ri=ri, ch=ch,
                ),
                grid=(Tl * N, h1 // ri),
                in_specs=[
                    v3._row_spec(ri, w1p * v3.WINP),
                    v3._chunkcol_spec(ri, nch, ch),
                    v3._slab_spec(ri, hp, lanes),
                ],
                out_specs=pl.BlockSpec(
                    (1, ri, nch, v3.WINP, ch * v3.WINP),
                    lambda t, i: (t, i, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (Tl * N, h1, nch, v3.WINP, ch * v3.WINP), slab.dtype
                ),
                scratch_shapes=[
                    pltpu.VMEM((ch * v3.WINP, wlp), slab.dtype),
                    pltpu.VMEM((v3.WINP, ch * v3.WINP), slab.dtype),
                ],
            )(xp, yc, volr)

        return run

    def slope_time(run, reps=(4, 12)):
        results = {}
        for R in reps:
            @jax.jit
            def f(acc, c, volr):
                def body(i, acc):
                    out = run(c + acc, volr)
                    return acc + out.astype(jnp.float32).sum() * 1e-20
                return jax.lax.fori_loop(0, R, body, acc)

            v = float(f(jnp.float32(0.0), coords, volr_host))
            assert np.isfinite(v)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(f(jnp.float32(0.0), coords, volr_host))
                best = min(best, time.perf_counter() - t0)
            results[R] = best
        r1, r2 = reps
        return (results[r2] - results[r1]) / (r2 - r1) * 1e3

    nchunks = Tl * N * h1 * (w1p // ch)
    for variant in ("full", "nocopy", "nodiag", "nomm2", "nomm1",
                    "streamonly"):
        ms = slope_time(build(variant))
        print(f"{variant:11s} {ms:7.2f} ms/iter   "
              f"({ms * 1e6 / nchunks:6.0f} ns/chunk)", flush=True)


if __name__ == "__main__":
    main()
