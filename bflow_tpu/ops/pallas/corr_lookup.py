"""Pallas TPU kernel: windowed bilinear correlation lookup.

Every query pixel owns its own (hl, wl) correlation map inside the
all-pairs volume; the lookup reads one (2r+2)x(2r+2) patch around
floor(coord) per query and blends the four corner-shifted (2r+1)^2
windows with the fractional weights.

Kernel strategy: grid over (target*batch, h1); each program receives one
query row's (w1, hl+2*PR, wl) volume slab in VMEM. Mosaic constraints
shape the addressing:

  * dynamic starts are only legal on the sublane dim, so the kernel
    loads a 16-row (tile-aligned) slab at the clamped row start and the
    *columns* are extracted with a one-hot contraction on the MXU
    (patch[a, b] = rows[a, ix + b]); out-of-range columns produce
    all-zero one-hot rows — grid_sample zero padding for free;
  * rows are zero-padded by PR=16 per side so the clamped 16-row load
    is exact whenever any window row is in-bounds, and a fully
    out-of-bounds window reads only zeros;
  * per-query scalar starts/fractions arrive as unblocked HBM arrays
    (lane-padded to 128) and are DMA'd into SMEM scratch per program.

The volume streams HBM->VMEM once per lookup with the grid pipeline
double-buffering DMA against the tiny MXU/VPU work — replacing XLA's
scalar-core gather lowering (~200 ms/iteration at DSEC val resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PR = 16  # row zero-padding per side; also the (tile-aligned) rows loaded


def _kernel(
    idx_hbm, frac_hbm, vol_ref, out_ref, idx_s, frac_s, sem, *, w1, win
):
    t = pl.program_id(0)
    i = pl.program_id(1)
    cp1 = pltpu.make_async_copy(idx_hbm.at[t, i], idx_s, sem.at[0])
    cp2 = pltpu.make_async_copy(frac_hbm.at[t, i], frac_s, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    p2 = win + 1
    wl = vol_ref.shape[-1]

    def body(q, _):
        ix = idx_s[0, q]  # column window start: floor(cx) - r (unclamped)
        iy = idx_s[1, q]  # clamped padded row start
        fx = frac_s[0, q]
        fy = frac_s[1, q]
        rows = vol_ref[0, 0, q, pl.ds(iy, PR), :]  # (PR, wl)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (p2, wl), 1)
        k_ids = jax.lax.broadcasted_iota(jnp.int32, (p2, wl), 0)
        ex = (col_ids == ix + k_ids).astype(rows.dtype)
        # patch[a, b] = rows[a, ix + b]; zero when ix+b is out of range.
        # f32 volumes use HIGHEST (single-pass MXU bf16 would round the
        # correlation values); bf16 volumes take the fast single pass.
        prec = (
            jax.lax.Precision.HIGHEST
            if rows.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        patch = jax.lax.dot_general(
            rows, ex, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        out_ref[0, 0, q] = (
            (1.0 - fy) * (1.0 - fx) * patch[:win, :win]
            + (1.0 - fy) * fx * patch[:win, 1:p2]
            + fy * (1.0 - fx) * patch[1:p2, :win]
            + fy * fx * patch[1:p2, 1:p2]
        )
        return 0

    jax.lax.fori_loop(0, w1, body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_level_pallas(
    vol: jax.Array, coords: jax.Array, radius: int, interpret: bool = False
) -> jax.Array:
    """One pyramid level's windowed lookup.

    Args:
      vol: (Tl, N, h1, w1, hl, wl) correlation maps.
      coords: (Tl, N, h1, w1, 2) query positions in this level's pixels,
        (x, y) last.
      radius: window radius r (window diameter 2r+2 must fit in PR rows).

    Returns:
      (Tl, N, h1, w1, (2r+1)^2) window features, dy-major.
    """
    Tl, N, h1, w1, hl, wl = vol.shape
    r = radius
    win = 2 * r + 1
    assert win + 1 <= PR, (radius, PR)

    volp = jnp.pad(
        vol, ((0, 0), (0, 0), (0, 0), (0, 0), (PR, PR), (0, 0))
    ).reshape(Tl * N, h1, w1, hl + 2 * PR, wl)

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # column start: unclamped; the one-hot zeroes out-of-range columns
    ix = (x0.astype(jnp.int32) - r).reshape(Tl * N, h1, w1)
    # row start in padded rows, clamped so the PR-row load is in range;
    # clamping only moves fully-out-of-bounds windows deeper into padding
    iy = jnp.clip(
        y0.astype(jnp.int32) - r + PR, 0, hl + PR
    ).reshape(Tl * N, h1, w1)
    fx = (x - x0).astype(vol.dtype).reshape(Tl * N, h1, w1)
    fy = (y - y0).astype(vol.dtype).reshape(Tl * N, h1, w1)

    # lane-pad the per-row scalar slabs to the 128 tile
    wp = max(128, ((w1 + 127) // 128) * 128)
    padw = ((0, 0), (0, 0), (0, 0), (0, wp - w1))
    idx = jnp.pad(jnp.stack([ix, iy], axis=2), padw)  # (TN, h1, 2, wp)
    frac = jnp.pad(jnp.stack([fx, fy], axis=2), padw)

    out = pl.pallas_call(
        functools.partial(_kernel, w1=w1, win=win),
        grid=(Tl * N, h1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # idx, DMA'd manually
            pl.BlockSpec(memory_space=pltpu.ANY),  # frac
            pl.BlockSpec(
                (1, 1, w1, hl + 2 * PR, wl),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, w1, win, win),
            lambda t, i: (t, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Tl * N, h1, w1, win, win), vol.dtype
        ),
        scratch_shapes=[
            pltpu.SMEM((2, wp), jnp.int32),
            pltpu.SMEM((2, wp), vol.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx, frac, volp)

    return out.reshape(Tl, N, h1, w1, win * win)
