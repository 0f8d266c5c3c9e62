"""Pallas TPU kernels: windowed bilinear correlation lookup (fwd + vjp).

Every query pixel owns its own (hl, wl) correlation map inside the
all-pairs volume; the lookup reads one (2r+2)x(2r+2) patch around
floor(coord) per query and bilinearly blends the four corner-shifted
(2r+1)^2 windows.

Forward kernel strategy: grid over (target*batch, h1); each program
receives one query row's row-padded (w1, hl+PF+PB, wl) volume slab in
VMEM. Mosaic's addressing rules shape the extraction:

  * dynamic slice starts are only legal on the sublane dim and must be
    tile-aligned (bf16 tiles are 16 sublanes), so the kernel loads a
    32-row slab from a 16-aligned start (`pl.multiple_of`) and selects
    the wanted rows with a one-hot MXU contraction;
  * lane (column) extraction is a second one-hot contraction;
    out-of-range columns give all-zero one-hot rows — grid_sample zero
    padding for free;
  * rows are zero-padded (16 front / 32 back) so the clamped aligned
    load is exact whenever any window row is in-bounds and fully
    out-of-bounds windows read only zeros;
  * per-query scalar starts/fractions arrive as unblocked HBM arrays
    (lane-padded to 128) and are DMA'd into SMEM scratch per program;
  * the query loop is fully unrolled (Mosaic supports only full/no
    unroll) — 5.7x over the looped form.

Backward (custom VJP): the output is bilinear in (fx, fy) and linear in
the volume, so both cotangents are the same one-hot contractions
transposed. Queries own disjoint volume maps, so the volume-cotangent
"scatter" is collision-free slab stores into a zeroed output block. The
per-query coordinate gradients accumulate in SMEM and DMA out per
program. This replaces XLA's scalar-core scatter lowering in the
training path exactly like the forward replaces its gather.
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


def _precision(dt):
    # f32 volumes need HIGHEST (single-pass MXU bf16 would round the
    # correlation values); bf16 volumes take the fast default pass.
    return (
        jax.lax.Precision.HIGHEST
        if dt == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _selectors(off, ix, fx, fy, win, wl, dt):
    """Interpolating row/column selector matrices and their frac
    derivatives. ey[a, j] = (j==off+a)(1-fy) + (j==off+a+1)fy over the
    PRL loaded rows; exc[b, c] likewise over the wl columns with
    unclamped ix (out-of-range taps vanish -> zero padding)."""
    j_ids = jax.lax.broadcasted_iota(jnp.int32, (win, PRL), 1)
    a_ids = jax.lax.broadcasted_iota(jnp.int32, (win, PRL), 0)
    ry0 = (j_ids == off + a_ids).astype(jnp.float32)
    ry1 = (j_ids == off + a_ids + 1).astype(jnp.float32)
    ey = (ry0 * (1.0 - fy) + ry1 * fy).astype(dt)
    dey = (ry1 - ry0).astype(dt)

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (win, wl), 1)
    b_ids = jax.lax.broadcasted_iota(jnp.int32, (win, wl), 0)
    cx0 = (c_ids == ix + b_ids).astype(jnp.float32)
    cx1 = (c_ids == ix + b_ids + 1).astype(jnp.float32)
    exc = (cx0 * (1.0 - fx) + cx1 * fx).astype(dt)
    dexc = (cx1 - cx0).astype(dt)
    return ey, dey, exc, dexc


def _fwd_kernel(
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

    wl = vol_ref.shape[-1]
    dt = vol_ref.dtype
    prec = _precision(dt)

    for q in range(w1):  # full unroll
        ix = idx_s[0, q]
        iy = idx_s[1, q]
        fx = frac_s[0, q]
        fy = frac_s[1, q]
        iy_al = pl.multiple_of((iy // ALIGN) * ALIGN, ALIGN)
        rows = vol_ref[0, 0, q, pl.ds(iy_al, PRL), :]  # (PRL, wl)
        ey, _, exc, _ = _selectors(iy - iy_al, ix, fx, fy, win, wl, dt)
        sel = jax.lax.dot_general(  # (win, wl) = ey @ rows
            ey, rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        out = jax.lax.dot_general(  # (win, win)
            sel, exc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        out_ref[0, 0, q] = out.astype(out_ref.dtype)


def _bwd_kernel(
    idx_hbm, frac_hbm, vol_ref, g_ref, dvol_ref, dfrac_hbm,
    idx_s, frac_s, dfrac_s, sem, *, w1, win
):
    t = pl.program_id(0)
    i = pl.program_id(1)
    cp1 = pltpu.make_async_copy(idx_hbm.at[t, i], idx_s, sem.at[0])
    cp2 = pltpu.make_async_copy(frac_hbm.at[t, i], frac_s, sem.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    wl = vol_ref.shape[-1]
    dt = vol_ref.dtype
    prec = _precision(dt)

    # queries own disjoint maps: zero the block, then each query writes
    # its own PRL-row slab — no collisions by construction
    dvol_ref[...] = jnp.zeros_like(dvol_ref)

    for q in range(w1):  # full unroll
        ix = idx_s[0, q]
        iy = idx_s[1, q]
        fx = frac_s[0, q]
        fy = frac_s[1, q]
        iy_al = pl.multiple_of((iy // ALIGN) * ALIGN, ALIGN)
        off = iy - iy_al
        rows = vol_ref[0, 0, q, pl.ds(iy_al, PRL), :]
        ey, dey, exc, dexc = _selectors(off, ix, fx, fy, win, wl, dt)
        g = g_ref[0, 0, q].astype(dt)  # (win, win)

        # dVol = ey^T @ g @ exc  (the forward contractions, transposed)
        ge = jax.lax.dot_general(  # (win, wl) = g @ exc
            g, exc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        dslab = jax.lax.dot_general(  # (PRL, wl) = ey^T @ ge
            ey, ge, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dvol_ref[0, 0, q, pl.ds(iy_al, PRL), :] = dslab.astype(dt)

        # dfx = <g, ey @ rows @ dexc^T>, dfy = <g, dey @ rows @ exc^T>
        sel = jax.lax.dot_general(
            ey, rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        tx = jax.lax.dot_general(  # (win, win)
            sel, dexc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dsel = jax.lax.dot_general(
            dey, rows, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(dt)
        ty = jax.lax.dot_general(
            dsel, exc, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        gf = g_ref[0, 0, q].astype(jnp.float32)
        dfrac_s[0, q] = jnp.sum(gf * tx)
        dfrac_s[1, q] = jnp.sum(gf * ty)

    cp3 = pltpu.make_async_copy(dfrac_s, dfrac_hbm.at[t, i], sem.at[0])
    cp3.start()
    cp3.wait()


def _pack_scalars(vol, coords, radius):
    Tl, N, h1, w1, hl, wl = vol.shape
    r = radius
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
    wp = max(128, ((w1 + 127) // 128) * 128)
    padw = ((0, 0), (0, 0), (0, 0), (0, wp - w1))
    idx = jnp.pad(jnp.stack([ix, iy], axis=2), padw)  # (TN, h1, 2, wp)
    frac = jnp.pad(jnp.stack([fx, fy], axis=2), padw)
    return idx, frac, wp


def _fwd_impl(vol, coords, radius, interpret):
    Tl, N, h1, w1, hl, wl = vol.shape
    win = 2 * radius + 1
    assert win + 1 <= PF, (radius, PF)
    volp = jnp.pad(
        vol, ((0, 0), (0, 0), (0, 0), (0, 0), (PF, PB), (0, 0))
    ).reshape(Tl * N, h1, w1, hl + PF + PB, wl)
    idx, frac, wp = _pack_scalars(vol, coords, radius)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, w1=w1, win=win),
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


def _bwd_impl(vol, coords, g, radius, interpret):
    Tl, N, h1, w1, hl, wl = vol.shape
    win = 2 * radius + 1
    volp = jnp.pad(
        vol, ((0, 0), (0, 0), (0, 0), (0, 0), (PF, PB), (0, 0))
    ).reshape(Tl * N, h1, w1, hl + PF + PB, wl)
    idx, frac, wp = _pack_scalars(vol, coords, radius)
    g5 = g.reshape(Tl * N, h1, w1, win, win)

    dvolp, dfrac = pl.pallas_call(
        functools.partial(_bwd_kernel, w1=w1, win=win),
        grid=(Tl * N, h1),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(
                (1, 1, w1, hl + PF + PB, wl),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, w1, win, win),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, w1, hl + PF + PB, wl),
                lambda t, i: (t, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # dfrac, DMA'd out
        ),
        out_shape=(
            jax.ShapeDtypeStruct(
                (Tl * N, h1, w1, hl + PF + PB, wl), vol.dtype
            ),
            jax.ShapeDtypeStruct((Tl * N, h1, 2, wp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.SMEM((2, wp), jnp.int32),
            pltpu.SMEM((2, wp), jnp.float32),
            pltpu.SMEM((2, wp), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(idx, frac, volp, g5)

    dvol = (
        dvolp.reshape(Tl, N, h1, w1, hl + PF + PB, wl)[
            ..., PF : PF + hl, :
        ]
    )
    dfx = dfrac[:, :, 0, :w1].reshape(Tl, N, h1, w1)
    dfy = dfrac[:, :, 1, :w1].reshape(Tl, N, h1, w1)
    dcoords = jnp.stack([dfx, dfy], axis=-1).astype(coords.dtype)
    return dvol, dcoords


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_cvjp(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret)


def _vjp_fwd(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret), (vol, coords)


def _vjp_bwd(radius, interpret, residuals, g):
    vol, coords = residuals
    return _bwd_impl(vol, coords, g, radius, interpret)


_lookup_cvjp.defvjp(_vjp_fwd, _vjp_bwd)


def lookup_level_pallas(
    vol: jax.Array, coords: jax.Array, radius: int, interpret: bool = False
) -> jax.Array:
    """One pyramid level's windowed lookup (differentiable custom VJP).

    Args:
      vol: (Tl, N, h1, w1, hl, wl) correlation maps (f32 or bf16).
      coords: (Tl, N, h1, w1, 2) query positions in this level's pixels,
        (x, y) last.
      radius: window radius r (window diameter 2r+2 must fit in PF rows).

    Returns:
      (Tl, N, h1, w1, (2r+1)^2) window features, dy-major, vol dtype.
    """
    return _lookup_cvjp(vol, coords, radius, interpret)
