"""Relay-safe TPU timing helpers.

Through the axon relay `jax.block_until_ready` is a NO-OP (it returns
before device execution; a 1.1 TFLOP matmul "blocks" in 0.07 ms while
its first forced readback drains an 87 s queue — measured 2026-08-19).
Every measurement must force a scalar readback (`float(out)`), and
sub-millisecond ops must amortize the ~25-30 ms round-trip: run R
repetitions inside ONE jitted lax.fori_loop whose carry perturbs the
inputs (defeats CSE/hoisting) and take the slope between two R values.

This is the perf_breakdown.py method, shared so one-off experiment
scripts stop reinventing (or breaking) it. Historical note: every
pre-round-4 `exp_*` script that timed with bare block_until_ready
loops measured DISPATCH, not execution — those isolated-op numbers
are void (docs/STATUS.md round-4 erratum).
"""

from __future__ import annotations

import time

import numpy as np


def slope_time_ms(run, args, reps=(4, 12), tries=3):
    """Per-op milliseconds of `run(*args) -> array`, by slope timing.

    run must be jit-compatible; args are jnp arrays. The first arg is
    perturbed by the loop carry (must be float-typed).
    """
    import jax
    import jax.numpy as jnp

    results = {}
    for R in reps:

        @jax.jit
        def f(acc, *a):
            def body(i, acc):
                out = run(a[0] + acc, *a[1:])
                return acc + out.astype(jnp.float32).sum() * 1e-20

            return jax.lax.fori_loop(0, R, body, acc)

        v = float(f(jnp.float32(0.0), *args))  # compile + warmup
        assert np.isfinite(v), v
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(f(jnp.float32(0.0), *args))
            best = min(best, time.perf_counter() - t0)
        results[R] = best
    r1, r2 = reps
    return (results[r2] - results[r1]) / (r2 - r1) * 1e3
