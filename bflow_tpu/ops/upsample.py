"""Convex-combination 8x upsampling (RAFT-style), NHWC.

Matches the reference cvx_upsample (/root/reference/models/raft_utils/
utils.py:33-48): the network predicts, per coarse pixel, a (9, 8, 8) logit
tensor; a softmax over the 9 spatial neighbours yields convex weights that
blend the 3x3 neighbourhood of the (x8-scaled) coarse field into each of
the 8x8 fine sub-pixels.

TPU-native formulation: the 9 shifted neighbour maps are materialised via
padding + static slicing (pure data movement XLA fuses away), and the blend
is a single einsum that the compiler maps onto the MXU/VPU. No im2col
buffer is ever built in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _shifted_stack(data: jax.Array) -> jax.Array:
    """(N, H, W, D) -> (N, H, W, 9, D): 3x3 neighbourhoods, zero padded.

    Neighbour index k = ky * 3 + kx enumerates offsets (ky-1, kx-1), the
    same ordering torch's F.unfold uses for a 3x3 kernel.
    """
    N, H, W, D = data.shape
    padded = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    shifts = [
        padded[:, ky : ky + H, kx : kx + W, :]
        for ky in range(3)
        for kx in range(3)
    ]
    return jnp.stack(shifts, axis=3)


def convex_upsample(data: jax.Array, mask: jax.Array, factor: int = 8) -> jax.Array:
    """Upsample (N, H, W, D) -> (N, factor*H, factor*W, D).

    Args:
      data: coarse field (N, H, W, D). Scaled by ``factor`` internally
        because the field holds *displacements* measured in coarse pixels.
      mask: (N, H, W, 9 * factor**2) logits; channel c = k * factor**2 +
        (i * factor + j) for neighbour k and sub-pixel (i, j) — the layout
        the reference mask head produces after NCHW->NHWC conversion.
    """
    N, H, W, D = data.shape
    f = factor
    assert mask.shape == (N, H, W, 9 * f * f), (mask.shape, data.shape)

    logits = mask.reshape(N, H, W, 9, f * f)
    weights = jax.nn.softmax(logits, axis=3)

    neigh = _shifted_stack(data * float(f))  # (N, H, W, 9, D)

    # (N, H, W, f*f, D): convex blend over the 9 neighbours. The k=9
    # contraction is tiny and bandwidth-bound, so full fp32 accumulation
    # is free — and required for parity with the reference fp32 path.
    up = jnp.einsum(
        "nhwks,nhwkd->nhwsd",
        weights,
        neigh,
        precision=jax.lax.Precision.HIGHEST,
    )

    up = up.reshape(N, H, W, f, f, D)
    up = up.transpose(0, 1, 3, 2, 4, 5)  # (N, H, f, W, f, D)
    return up.reshape(N, H * f, W * f, D)
