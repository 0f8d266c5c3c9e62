"""Same-session A/B: motion-encoder convc1 consumed as per-level
partial-sum einsums vs the materialized 891-channel concat.

The lookup emits one (Tl, N, h1, w1, 81) tensor per pyramid level;
today corr_lookup transposes each to (N, h1, w1, Tl*81) and
concatenates to the 891-channel corr map, which makes an HBM round
trip purely to be contracted by convc1's 1x1 kernel
(models/update.py). Since convc1 is linear, cor = relu(sum_l
einsum('tnhwq,tqc->nhwc', out_l, W_l) + b) with W split row-blocks in
the same (level, target, window) order — no transpose, no concat, no
891-channel intermediate.

Usage: python scripts/exp_fuse_c1.py [batch=4] [iters=30]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    h1, w1, win2, co = 60, 80, 81, 256
    tls = [5, 2, 2, 2]  # flagship per-level target counts (E_I_LU4_BD2)
    cin = sum(t * win2 for t in tls)  # 891

    rng = np.random.default_rng(0)
    outs = [
        jnp.asarray(rng.standard_normal((t, B, h1, w1, win2)),
                    jnp.bfloat16)
        for t in tls
    ]
    w = jnp.asarray(rng.standard_normal((cin, co)) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rng.standard_normal((co,)) * 0.02, jnp.bfloat16)

    # W row blocks in (level, target, window) channel order
    w_blocks, off = [], 0
    for t in tls:
        w_blocks.append(w[off : off + t * win2].reshape(t, win2, co))
        off += t * win2

    def concat_path(*outs):
        x = jnp.concatenate(
            [f.transpose(1, 2, 3, 0, 4).reshape(B, h1, w1, -1)
             for f in outs],
            axis=-1,
        )
        y = jnp.matmul(x.reshape(-1, cin), w) + b
        return jax.nn.relu(y.reshape(B, h1, w1, co))

    def fused_path(*outs):
        acc = None
        for f, wb in zip(outs, w_blocks):
            part = jnp.einsum("tnhwq,tqc->nhwc", f, wb,
                              preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
        return jax.nn.relu((acc + b.astype(jnp.float32)).astype(
            jnp.bfloat16
        ))

    fa = jax.jit(concat_path)
    fb = jax.jit(fused_path)
    ya = fa(*outs)
    yb = fb(*outs)
    jax.block_until_ready((ya, yb))
    d = np.abs(np.asarray(ya, np.float32) - np.asarray(yb, np.float32))
    print(f"max|d| = {d.max():.3e} (bf16 accumulation-order noise)")

    for name, f in (("concat+matmul", fa), ("fused einsums", fb)):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(K - 1):
                f(*outs)
            jax.block_until_ready(f(*outs))
            best = min(best, (time.perf_counter() - t0) / K)
        print(f"{name}: {best*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
