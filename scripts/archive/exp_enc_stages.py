"""Encoder stage timing at flagship shapes (slope method, relay-safe).

Times cumulative prefixes of BasicEncoder on the event-encoder input
(5*B samples of 480x640x15) so per-stage cost is the difference of
adjacent rows. Distinguishes conv cost from norm cost per stage: the
instance-norm stats pass is a full activation read that XLA cannot
fuse into the convs around it, and the breakdown shows how much of the
68.9 ms (B=16, round 4) that barrier costs.

Usage: python scripts/exp_enc_stages.py [B=16] [norm=instance]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import numpy as np


def main() -> None:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from _timing import slope_time_ms
    from bflow_tpu.models.extractor import (
        BasicEncoder,
        Conv1x1,
        Norm,
        ResidualBlock,
        StemConv,
    )

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    norm = sys.argv[2] if len(sys.argv) > 2 else "instance"
    H, W, C = 480, 640, 15
    NB = 5 * B
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    class Prefix(nn.Module):
        upto: int  # 0 stem, 1 +norm1+relu, 2..4 +layerN, 5 +conv2

        @nn.compact
        def __call__(self, x):
            x = StemConv(64, dtype=dt, name="conv1")(x)
            if self.upto >= 1:
                x = Norm(norm, num_groups=8, dtype=dt, name="norm1")(x)
                x = nn.relu(x)
            for stage, planes in ((1, 64), (2, 96), (3, 128)):
                if self.upto < stage + 1:
                    break
                stride = 1 if stage == 1 else 2
                x = ResidualBlock(planes, norm, stride, dtype=dt,
                                  name=f"layer{stage}_0")(x)
                x = ResidualBlock(planes, norm, 1, dtype=dt,
                                  name=f"layer{stage}_1")(x)
            if self.upto >= 5:
                x = Conv1x1(256, dtype=dt, name="conv2")(x)
            return x

    # device-side input (host gen + transfer would dominate the setup)
    x = jax.jit(
        lambda k: jax.random.normal(k, (NB, H, W, C), jnp.bfloat16)
    )(key)
    print(f"# enc stages: 5*{B} x {H}x{W}x{C}, norm={norm}", flush=True)

    names = ["stem", "+norm1", "+layer1", "+layer2", "+layer3", "+conv2"]
    prev = 0.0
    for upto, name in enumerate(names):
        mod = Prefix(upto)
        variables = jax.jit(mod.init)(key, x[:1])
        ms = slope_time_ms(
            lambda xx, v: mod.apply(v, xx), (x, variables), reps=(3, 9)
        )
        print(f"  upto {name:8s}: {ms:7.2f} ms  (+{ms - prev:6.2f})",
              flush=True)
        prev = ms

    # full encoder for cross-check against perf_breakdown numbers
    enc = BasicEncoder(256, norm, dtype=dt)
    variables = jax.jit(enc.init)(key, x[:1])
    ms = slope_time_ms(lambda xx, v: enc.apply(v, xx), (x, variables),
                       reps=(3, 9))
    print(f"  full encoder : {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
