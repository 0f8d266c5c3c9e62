"""On-device event-to-voxel-grid rasterization (jittable, static shapes).

The training pipeline rasterizes on the host (bflow_tpu/data/
representations.py) because grids are disk-cached; this module is the
*online inference* path: raw event tensors already on the TPU are
scattered into a voxel grid inside the jitted graph, so a streaming
deployment never bounces events through the host.

Semantics match the host rasterizer exactly (bilinear in time for
integer coordinates, trilinear x-y-t for float coordinates, polarity
+/-1). Variable event counts are handled the TPU way: pad the event
arrays to a static capacity and mark padding with `valid=False` — the
scatter weights of padding events are zeroed.

Implementation: corner contributions -> flat voxel indices ->
`segment_sum`. XLA lowers this to an efficient sorted scatter; a Pallas
scatter kernel was evaluated and rejected — per-event serial VMEM
updates cannot beat the fused one-pass sort+segment lowering for
unordered addresses.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("channels", "height", "width"))
def voxelize_events(
    x: jax.Array,
    y: jax.Array,
    polarity: jax.Array,
    t: jax.Array,
    valid: jax.Array,
    t0_center: jax.Array,
    t1_center: jax.Array,
    *,
    channels: int,
    height: int,
    width: int,
) -> jax.Array:
    """Rasterize padded event tensors into an (H, W, C) voxel grid.

    Args:
      x, y: (E,) pixel coordinates — float (rectified, trilinear) or
        integer (bilinear in time only).
      polarity: (E,) in {0, 1}.
      t: (E,) integer-like timestamps (microseconds).
      valid: (E,) bool; False entries contribute nothing.
      t0_center, t1_center: scalar window boundaries (centers of the
        first/last temporal bin).
    """
    E = x.shape[0]
    assert y.shape == polarity.shape == t.shape == valid.shape == (E,)
    ch, ht, wd = channels, height, width

    tf = t.astype(jnp.float32)
    t_norm = (
        (tf - t0_center.astype(jnp.float32))
        / (t1_center.astype(jnp.float32) - t0_center.astype(jnp.float32))
        * (ch - 1)
    )
    t_floor = jnp.floor(t_norm)
    value = jnp.where(valid, 2.0 * polarity.astype(jnp.float32) - 1.0, 0.0)

    int_xy = jnp.issubdtype(x.dtype, jnp.integer)
    n_voxels = ch * ht * wd

    indices = []
    weights = []
    if int_xy:
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)
        for dtc in (0.0, 1.0):
            tlim = t_floor + dtc
            w = value * (1.0 - jnp.abs(tlim - t_norm))
            m = (tlim >= 0) & (tlim < ch)
            idx = (yi * wd + xi) * ch + tlim.astype(jnp.int32)
            indices.append(jnp.where(m, idx, n_voxels))
            weights.append(jnp.where(m, w, 0.0))
    else:
        xf = x.astype(jnp.float32)
        yf = y.astype(jnp.float32)
        x_floor = jnp.floor(xf)
        y_floor = jnp.floor(yf)
        for dxc in (0.0, 1.0):
            xlim = x_floor + dxc
            wx = 1.0 - jnp.abs(xlim - xf)
            for dyc in (0.0, 1.0):
                ylim = y_floor + dyc
                wy = 1.0 - jnp.abs(ylim - yf)
                for dtc in (0.0, 1.0):
                    tlim = t_floor + dtc
                    wt = 1.0 - jnp.abs(tlim - t_norm)
                    m = (
                        (xlim >= 0) & (xlim < wd)
                        & (ylim >= 0) & (ylim < ht)
                        & (tlim >= 0) & (tlim < ch)
                    )
                    idx = (
                        ylim.astype(jnp.int32) * wd
                        + xlim.astype(jnp.int32)
                    ) * ch + tlim.astype(jnp.int32)
                    indices.append(jnp.where(m, idx, n_voxels))
                    weights.append(jnp.where(m, value * wx * wy * wt, 0.0))

    all_idx = jnp.concatenate(indices)
    all_w = jnp.concatenate(weights)
    # one overflow bucket swallows masked/padding contributions
    grid = jax.ops.segment_sum(all_w, all_idx, num_segments=n_voxels + 1)
    return grid[:n_voxels].reshape(ht, wd, ch)
