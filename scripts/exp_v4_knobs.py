"""On-chip A/B of the v4 kernel knobs: parity scratch, pipelined q8.

Also re-verifies the q8+pipeline output against the dequantized bf16
path ON THE REAL CHIP — the round-4 q8 pipelining corruption only
reproduced on hardware, so a speed win without this check is void.

Usage: python scripts/exp_v4_knobs.py [TN=20]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from _timing import slope_time_ms
    from bflow_tpu.ops.pallas.corr_lookup_v3 import (
        lookup_level_slab,
        lookup_level_slab_q8,
        quantize_slab,
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
    q, scale = jax.jit(quantize_slab)(slab)
    coords = jnp.asarray(
        np.stack([rng.uniform(0, wl, (TN, 1, h1, w1)),
                  rng.uniform(0, hl, (TN, 1, h1, w1))], -1), jnp.float32
    )

    def run(tag, fn, args, env):
        for k in ("BFLOW_V4_PARITY", "BFLOW_Q8_PIPE"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t = slope_time_ms(fn, args)
        print(f"{tag:22s}: {t:7.2f} ms/iter", flush=True)
        return t

    # parity scratch is the committed default; "0" rows are the old
    # shared-scratch schedule kept for regression tracking
    run("v4 bf16 (parity=0)", lambda c, s: lookup_level_slab(s, c, r),
        (coords, slab), {"BFLOW_V4_PARITY": "0"})
    run("v4 bf16 default", lambda c, s: lookup_level_slab(s, c, r),
        (coords, slab), {})
    run("v4 q8 (parity=0)",
        lambda c, qq, ss: lookup_level_slab_q8(qq, ss, c, r),
        (coords, q, scale), {"BFLOW_V4_PARITY": "0"})
    run("v4 q8 default",
        lambda c, qq, ss: lookup_level_slab_q8(qq, ss, c, r),
        (coords, q, scale), {})

    # ---- ON-CHIP correctness vs the unpipelined q8 path ------------
    # reference: q8 unpipelined shared-scratch (known-good on chip).
    # The default (parity, pipelined) must be bit-exact; the forced
    # pipe WITHOUT parity reproduces the round-4 corruption.
    for env, expect_clean in (
        ({}, True),  # committed default: parity + pipelined
        ({"BFLOW_V4_PARITY": "0", "BFLOW_Q8_PIPE": "1"}, False),
    ):
        os.environ["BFLOW_V4_PARITY"] = "0"
        os.environ.pop("BFLOW_Q8_PIPE", None)
        got = np.asarray(jax.jit(
            lambda qq, ss, c: lookup_level_slab_q8(qq, ss, c, r)
        )(q, scale, coords), np.float32)
        for k in ("BFLOW_V4_PARITY", "BFLOW_Q8_PIPE"):
            os.environ.pop(k, None)
        os.environ.update(env)
        got_pipe = np.asarray(jax.jit(
            lambda qq, ss, c: lookup_level_slab_q8(qq, ss, c, r)
        )(q, scale, coords), np.float32)
        bad = np.abs(got - got_pipe)
        tag = "default(parity,pipe)" if not env else "pipe-no-parity"
        print(f"q8 {tag} vs unpipelined: max abs diff {bad.max():.3e} "
              f"({(bad > 1e-6).mean() * 100:.4f}% cells differ; "
              f"clean expected: {expect_clean})", flush=True)


if __name__ == "__main__":
    main()
