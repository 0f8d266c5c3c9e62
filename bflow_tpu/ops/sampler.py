"""Bilinear sampling and coordinate grids (NHWC, pixel coordinates).

Semantics match ``torch.nn.functional.grid_sample(align_corners=True,
padding_mode='zeros')`` as used by the reference correlation lookup
(/root/reference/models/raft_utils/utils.py:5-21): with align_corners=True
the normalized grid maps back to *unnormalized pixel coordinates*, bilinear
interpolation between the four integer neighbours, and any neighbour that
falls outside the image contributes exactly zero.

We therefore skip the normalize/denormalize round-trip entirely and sample
directly at pixel coordinates — numerically identical and one less source
of rounding error.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coords_grid(batch: int, ht: int, wd: int, dtype=jnp.float32) -> jax.Array:
    """Pixel-coordinate grid, shape (batch, ht, wd, 2) with (x, y) order.

    Mirrors the reference coords_grid (/root/reference/models/raft_utils/
    utils.py:24-30) but NHWC-last: out[..., 0] = x, out[..., 1] = y.
    """
    xs = jax.lax.broadcasted_iota(dtype, (ht, wd), 1)
    ys = jax.lax.broadcasted_iota(dtype, (ht, wd), 0)
    grid = jnp.stack([xs, ys], axis=-1)
    return jnp.broadcast_to(grid[None], (batch, ht, wd, 2))


def bilinear_sample(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Sample ``img`` at fractional pixel ``coords`` with zero padding.

    Args:
      img:    (B, H, W) values. Each batch row is an independent image.
      coords: (B, ..., 2) pixel coordinates, last axis (x, y).

    Returns:
      (B, ...) sampled values; out-of-bounds neighbours contribute 0,
      matching grid_sample(align_corners=True, padding_mode='zeros').
    """
    assert img.ndim == 3, img.shape
    assert coords.shape[-1] == 2, coords.shape
    B, H, W = img.shape

    x = coords[..., 0]
    y = coords[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = x - x0
    dy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(B, H * W)

    def gather_corner(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        idx2 = idx.reshape(B, -1)
        vals = jnp.take_along_axis(flat, idx2, axis=1).reshape(idx.shape)
        return jnp.where(valid, vals, 0.0)

    v00 = gather_corner(y0i, x0i)
    v01 = gather_corner(y0i, x0i + 1)
    v10 = gather_corner(y0i + 1, x0i)
    v11 = gather_corner(y0i + 1, x0i + 1)

    top = v00 * (1.0 - dx) + v01 * dx
    bot = v10 * (1.0 - dx) + v11 * dx
    return top * (1.0 - dy) + bot * dy
