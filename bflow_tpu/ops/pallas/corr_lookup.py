"""Pallas TPU kernel: windowed bilinear correlation lookup.

Every query pixel owns its own (hl, wl) correlation map inside the
all-pairs volume; the lookup reads one (2r+2)x(2r+2) patch around
floor(coord) per query and blends the four corner-shifted (2r+1)^2
windows with the fractional weights.

Kernel strategy: grid over (target*batch, h1); each program receives one
query row's row-padded (w1, hl+PF+PB, wl) volume slab in VMEM. Mosaic's
addressing rules shape the extraction:

  * dynamic slice starts are only legal on the sublane dim and must be
    tile-aligned (bf16 tiles are 16 sublanes), so the kernel loads a
    32-row slab from a 16-aligned start (`pl.multiple_of`) and selects
    the 10 wanted rows with a one-hot MXU contraction;
  * lane (column) extraction is a second one-hot contraction —
    patch[a, b] = rows[a, ix + b]; out-of-range columns give all-zero
    one-hot rows, i.e. grid_sample zero padding for free;
  * rows are zero-padded (16 front / 32 back) so the clamped aligned
    load is exact whenever any window row is in-bounds and fully
    out-of-bounds windows read only zeros;
  * per-query scalar starts/fractions arrive as unblocked HBM arrays
    (lane-padded to 128) and are DMA'd into SMEM scratch per program.

The volume streams HBM->VMEM once per lookup with the grid pipeline
double-buffering DMA against the small MXU/VPU work — replacing XLA's
scalar-core gather lowering (~200 ms/iteration at DSEC val resolution).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PF = 16  # front row padding
PB = 32  # back row padding (aligned 32-row loads may reach this deep)
ALIGN = 16  # dynamic sublane starts must be multiples of the bf16 tile
PRL = 32  # rows loaded per query (>= ALIGN-1 + window diameter)


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

        iy_al = pl.multiple_of((iy // ALIGN) * ALIGN, ALIGN)
        off = iy - iy_al  # in [0, ALIGN)
        rows = vol_ref[0, 0, q, pl.ds(iy_al, PRL), :]  # (PRL, wl)

        # row selection: ey[a, j] = (j == off + a)  -> (p2, PRL) one-hot
        j_ids = jax.lax.broadcasted_iota(jnp.int32, (p2, PRL), 1)
        a_ids = jax.lax.broadcasted_iota(jnp.int32, (p2, PRL), 0)
        ey = (j_ids == off + a_ids).astype(rows.dtype)
        sel = jax.lax.dot_general(  # (p2, wl) = ey @ rows
            ey, rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # column selection: exc[b, c] = (c == ix + b)
        c_ids = jax.lax.broadcasted_iota(jnp.int32, (p2, wl), 1)
        b_ids = jax.lax.broadcasted_iota(jnp.int32, (p2, wl), 0)
        exc = (c_ids == ix + b_ids).astype(sel.dtype)
        # f32 volumes need HIGHEST (single-pass MXU bf16 would round the
        # correlation values); bf16 volumes take the fast default pass.
        prec = (
            jax.lax.Precision.HIGHEST
            if rows.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        )
        patch = jax.lax.dot_general(  # (p2, p2): patch[a, b]
            sel, exc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

        blend = (
            (1.0 - fy) * (1.0 - fx) * patch[:win, :win]
            + (1.0 - fy) * fx * patch[:win, 1:p2]
            + fy * (1.0 - fx) * patch[1:p2, :win]
            + fy * fx * patch[1:p2, 1:p2]
        )
        out_ref[0, 0, q] = blend.astype(out_ref.dtype)
        return 0

    # full unroll: the per-query bodies are independent; unrolling lets
    # the scalar core race ahead and overlaps MXU/VPU work across queries
    # (Mosaic supports only full or no unroll)
    for q in range(w1):
        body(q, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_level_pallas(
    vol: jax.Array, coords: jax.Array, radius: int, interpret: bool = False
) -> jax.Array:
    """One pyramid level's windowed lookup.

    Args:
      vol: (Tl, N, h1, w1, hl, wl) correlation maps (f32 or bf16).
      coords: (Tl, N, h1, w1, 2) query positions in this level's pixels,
        (x, y) last.
      radius: window radius r (window diameter 2r+2 must fit in PF rows).

    Returns:
      (Tl, N, h1, w1, (2r+1)^2) window features, dy-major, vol dtype
      (fractional blend in f32).
    """
    Tl, N, h1, w1, hl, wl = vol.shape
    r = radius
    win = 2 * r + 1
    assert win + 1 <= PF, (radius, PF)

    volp = jnp.pad(
        vol, ((0, 0), (0, 0), (0, 0), (0, 0), (PF, PB), (0, 0))
    ).reshape(Tl * N, h1, w1, hl + PF + PB, wl)

    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    # column start: unclamped; the one-hot zeroes out-of-range columns
    ix = (x0.astype(jnp.int32) - r).reshape(Tl * N, h1, w1)
    # row start in padded rows, clamped so the aligned PRL-row load stays
    # in range; clamping only moves fully-out-of-bounds windows deeper
    # into the zero padding
    iy = jnp.clip(
        y0.astype(jnp.int32) - r + PF, 0, hl + PF
    ).reshape(Tl * N, h1, w1)
    fx = (x - x0).astype(jnp.float32).reshape(Tl * N, h1, w1)
    fy = (y - y0).astype(jnp.float32).reshape(Tl * N, h1, w1)

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
                (1, 1, w1, hl + PF + PB, wl),
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
            pltpu.SMEM((2, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx, frac, volp)

    return out.reshape(Tl, N, h1, w1, win * win)
