"""Pallas TPU kernel v5: y-rebased, per-query-op-free banded lookup.

Same op as corr_lookup_v3 (windowed bilinear correlation lookup,
reference semantics /root/reference/models/raft_utils/corr.py:307-351),
restructured around two round-4 hardware findings:

  * The v4 kernel at the flagship level 0 runs 171-244 ns per 8-query
    chunk against a ~100 ns HBM stream (scripts/exp_v5_attrib.py,
    bench_v5.py) — part stream-bound, part per-query VPU issue (8
    lane-misaligned band copies cost ~44 ns/chunk; the deep pyramid
    levels, with tiny bands, are almost pure per-query issue across
    ~38K chunks/iter at B=16).
  * A query's window touches at most 2r+2 <= 10 of the hp (<= 64) map
    rows the kernel contracts.

Design:

  * Per-chunk y-REBASING: the host precomputes, per query chunk, a
    16-aligned row offset y0 = clamp((floor(min_y)-r) & ~15, 0, hp-K)
    such that the K=32-row band [y0, y0+K) covers every query's window
    whenever the chunk's y-spread fits. The y-blend contracts
    (cw, K) @ (K, cb) — half the v4 MXU junk at hp=64 — reading the
    band as a dynamic-sublane slice of the auto-pipelined VMEM block.
    Levels with hp <= K take K_eff = hp (whole band, y0 = 0) and still
    profit from the tail below.
  * EXACT tall-spread fallback: when a chunk's windows exceed row
    y0+K-1 (motion boundaries), a host-computed flag switches that
    chunk to a branch that adds a second K-row slice at the static
    offset yB = hp-K, hat-masked to rows >= y0+K so the overlap with
    block A contributes exactly once. Two clamped K-blocks cover any
    hp <= 2K (`supports`). Rare on smooth flow; the common branch pays
    nothing for it.
  * PER-QUERY-OP-FREE tail: v4 assembled each query's band and window
    with per-query copies (8-16 VPU ops/chunk, lane-misaligned). Both
    assemblies are block-diagonal extractions, which one STATIC mask
    multiply + one STATIC 0/1-selector matmul compute for the whole
    chunk at once:
        band gather   S2 = (rp * gmask) @ Rsel
            gmask[s,l] = [l//wlp == s//WINP]     (kills junk blocks)
            Rsel[l,u]  = [l mod wlp == u]        (folds bands to cols)
        window pack   d  = Sel @ (out * dmask)
            dmask[s,c] = [s//WINP == c//WINP]
            Sel[s',s]  = [s mod WINP == s']      (tiled identity)
    Each output element receives exactly one nonzero product, so the
    selector matmuls are exact in the compute dtype. Per chunk this is
    3 MXU issues + 2 VPU multiplies, independent of ch — the per-query
    scaling is gone, which is what the deep levels needed.
  * int8 mode reuses the same structure (the band cast is an ordinary
    value dependency of the rebased slice, outside any software
    pipeline, so the v4 mosaic pipelining hazard does not apply).
  * Chunk offsets travel as (8, 128) 2-D SMEM blocks shared by 8
    consecutive programs (row = flat program id % 8): the TPU
    block-shape rule forbids (1, ri*nch) slices, and a 3-D SMEM block
    compiled but read garbage on real v5e (round-4 q8 scale bug).

Negative result, kept for the record: a manual double-buffered
HBM->VMEM DMA of only the K-row bands (2x fewer bytes than streaming
full hp rows) measured 78 ms/iter vs v4's 11.7 at B=16 level 0 — a
(32, 640)-strided per-chunk DMA is latency-bound (~1.6 us/chunk) and
two slots cannot hide it, while the rare-path synchronous fallback DMA
made adversarial coords another 60% slower. Bulk BlockSpec streaming
with in-VMEM rebased slices keeps the DMA engine on large contiguous
transfers and takes the MXU/VPU wins anyway.

Backward reuses the v4 kernel unchanged — a VJP needs the same math,
not the same schedule; inference and the training forward take v5, the
backward streams full bands anyway to write dVol.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bflow_tpu.ops.pallas.corr_lookup_v3 import (
    WINP,
    _bwd_impl,
    _chunkcol_spec,
    _hat,
    _pick_ri,
    _precision,
    _prep_positions,
    _resolve_chunking,
    _row_spec,
    _slab_spec,
    _unpack_windows,
)

K_BAND = 32  # rebased band rows (multiple of 16; covers 2r+2 + slack)


def supports(hp: int, radius: int) -> bool:
    """All production levels qualify: hp <= K needs no rebasing (whole
    band in one block); K < hp <= 2K rebases with the two-block
    fallback, provided a 16-aligned block fits a window."""
    if hp <= K_BAND:
        return True
    return hp <= 2 * K_BAND and 2 * radius + 2 + 15 <= K_BAND


def _chunk_bounds(coords, radius, w1p, ch, hp):
    """Per-chunk rebase offsets, host side. coords: (TN, h1, w1, 2).

    Returns int32 (TN, h1, nch) pair:
      y0    — 16-aligned first row of the K-row band, in [0, hp-K].
      need2 — 1 when some query's window exceeds row y0+K-1 (the
              second block at yB = hp-K must be accumulated).
    Bounds come from the raw (unpadded) coords, so a chunk's limits
    are over its real queries only; kernel-side padded queries carry
    zero hat weights and merely share rows they don't use.
    """
    tn, h1, w1, _ = coords.shape
    nch = w1p // ch
    if hp <= K_BAND:  # single block covers the whole map
        z = jnp.zeros((tn, h1, nch), jnp.int32)
        return z, z
    y = coords[..., 1]
    if w1p != w1:
        pad = ((0, 0), (0, 0), (0, w1p - w1))
        y_min_src = jnp.pad(y, pad, constant_values=jnp.inf)
        y_max_src = jnp.pad(y, pad, constant_values=-jnp.inf)
    else:
        y_min_src = y_max_src = y
    y_min = jnp.min(y_min_src.reshape(tn, h1, nch, ch), axis=-1)
    y_max = jnp.max(y_max_src.reshape(tn, h1, nch, ch), axis=-1)
    lo = jnp.floor(y_min).astype(jnp.int32) - radius
    hi = jnp.floor(y_max).astype(jnp.int32) + radius + 1  # top row used
    y0 = jnp.clip(lo & ~15, 0, hp - K_BAND)
    need2 = (hi > y0 + K_BAND - 1).astype(jnp.int32)
    return y0, need2


def _block_iota(shape, axis, div):
    # lax.div, not //: jnp's signed floor-div expands into a
    # sign-correction subgraph that trips a mosaic lowering-cache bug
    # (round-4 MLIR KeyError); operands here are non-negative, where
    # truncating and floor division coincide.
    i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return jax.lax.div(i, jnp.full(shape, div, jnp.int32))


def _mod_iota(shape, axis, mod):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
    return jax.lax.rem(i, jnp.full(shape, mod, jnp.int32))


def _fwd_kernel(
    y0_ref, n2_ref, xp_ref, yc_ref, vol_ref,  # inputs
    out_ref,  # output
    *, w1p, hp, wlp, ri, ch, quant, out_dt, kband,
):
    dt = out_dt
    prec = _precision(dt)
    nch = w1p // ch
    cb = ch * wlp
    cw = ch * WINP
    # this program's row within the shared (8, 128) SMEM offset block
    srow = jax.lax.rem(
        pl.program_id(0) * pl.num_programs(1) + pl.program_id(1), 8
    )
    yb = hp - kband  # second-block offset (static)

    # static selectors for the block-diagonal extractions (see module
    # docstring); built once per program, reused by every chunk
    gmask = (
        _block_iota((cw, cb), 1, wlp) == _block_iota((cw, cb), 0, WINP)
    ).astype(dt)
    rsel = (
        _mod_iota((cb, wlp), 0, wlp)
        == jax.lax.broadcasted_iota(jnp.int32, (cb, wlp), 1)
    ).astype(dt)
    dmask = (
        _block_iota((cw, cw), 0, WINP) == _block_iota((cw, cw), 1, WINP)
    ).astype(dt)
    sel = (
        _mod_iota((WINP, cw), 1, WINP)
        == jax.lax.broadcasted_iota(jnp.int32, (WINP, cw), 0)
    ).astype(dt)

    def band_at(rl, c, y0):
        if kband == hp:  # whole band; y0 is 0 by construction
            band = vol_ref[0, rl, :, c * cb : (c + 1) * cb]
        else:
            band = vol_ref[
                0, rl, pl.ds(pl.multiple_of(y0, 16), kband),
                c * cb : (c + 1) * cb,
            ]
        return band.astype(dt) if quant else band

    for rl in range(ri):
        exT = _hat(xp_ref[0, rl], wlp, 0).astype(dt)
        for c in range(nch):
            y0 = y0_ref[srow, rl * nch + c]
            yv = yc_ref[0, rl, :, c : c + 1]  # (cw, 1) abs y taps
            ey2 = _hat(yv - y0.astype(jnp.float32), kband, 1).astype(dt)
            rp = jax.lax.dot_general(
                ey2, band_at(rl, c, y0), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

            def tail(rpf):
                s2 = jax.lax.dot_general(
                    rpf.astype(dt) * gmask, rsel,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                out = jax.lax.dot_general(
                    s2.astype(dt), exT[:, c * cw : (c + 1) * cw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                d = jax.lax.dot_general(
                    sel, out.astype(dt) * dmask,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                out_ref[0, rl, c] = d.astype(dt)

            if kband == hp:
                tail(rp)
                continue

            @pl.when(n2_ref[srow, rl * nch + c] == 0)
            def _():
                tail(rp)

            @pl.when(n2_ref[srow, rl * nch + c] == 1)
            def _():
                # tall spread: add the clamped second slice, hat-masked
                # to rows >= y0+K so the overlap with the first slice
                # counts once. Just another VMEM slice — no extra HBM.
                band2 = vol_ref[0, rl, yb : yb + kband,
                                c * cb : (c + 1) * cb]
                if quant:
                    band2 = band2.astype(dt)
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (1, kband), 1
                ) + yb
                ey2b = _hat(yv - float(yb), kband, 1)
                ey2b = jnp.where(rows >= y0 + kband, ey2b, 0.0).astype(dt)
                rp2 = jax.lax.dot_general(
                    ey2b, band2, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                tail(rp + rp2)


def _flat_smem_spec(h1ri):
    """Chunk-offset tables ride in SMEM as (8, 128) int32 blocks shared
    by 8 consecutive programs (row = flat program id % 8)."""
    return pl.BlockSpec(
        (8, 128),
        lambda t, i: ((t * h1ri + i) // 8, 0),
        memory_space=pltpu.SMEM,
    )


def _pack_chunk_table(x, nprog):
    """(TN, h1, nch)->(roundup(nprog,8), 128) int32 program-row table."""
    rows = x.reshape(nprog, -1)
    cols = rows.shape[1]
    assert cols <= 128, cols
    p8 = ((nprog + 7) // 8) * 8
    return jnp.pad(rows, ((0, p8 - nprog), (0, 128 - cols)))


def _fwd_impl(vol, coords, radius, interpret, scale=None):
    """vol: (Tl, N, h1, hp, lanes) slab (bf16/f32 or int8 + scale)."""
    Tl, N, h1, hp, lanes = vol.shape
    w1 = coords.shape[3]
    ch, w1p, wlp = _resolve_chunking(w1, lanes)
    win = 2 * radius + 1
    assert supports(hp, radius), (hp, radius)
    kband = min(K_BAND, hp)
    quant = scale is not None
    out_dt = jnp.bfloat16 if quant else vol.dtype

    volr = vol.reshape(Tl * N, h1, hp, lanes)
    cflat = coords.reshape(Tl * N, h1, w1, 2)
    xp, yc = _prep_positions(cflat, radius, w1p, ch)
    y0, need2 = _chunk_bounds(cflat, radius, w1p, ch, hp)
    nch = w1p // ch
    cw = ch * WINP
    ri = _pick_ri(h1, hp * lanes * vol.dtype.itemsize)
    h1ri = h1 // ri
    nprog = Tl * N * h1ri
    assert ri * nch <= 128, (ri, nch)
    y0f = _pack_chunk_table(y0, nprog)
    n2f = _pack_chunk_table(need2, nprog)

    packed = pl.pallas_call(
        functools.partial(
            _fwd_kernel, w1p=w1p, hp=hp, wlp=wlp, ri=ri, ch=ch,
            quant=quant, out_dt=out_dt, kband=kband,
        ),
        grid=(Tl * N, h1ri),
        in_specs=[
            _flat_smem_spec(h1ri),
            _flat_smem_spec(h1ri),
            _row_spec(ri, w1p * WINP),
            _chunkcol_spec(ri, nch, ch),
            _slab_spec(ri, hp, lanes),
        ],
        out_specs=pl.BlockSpec(
            (1, ri, nch, WINP, cw),
            lambda t, i: (t, i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (Tl * N, h1, nch, WINP, cw), out_dt
        ),
        interpret=interpret,
    )(y0f, n2f, xp, yc, volr)

    if quant:
        sc = scale.reshape(Tl * N, h1, 1, 1, 1).astype(packed.dtype)
        packed = packed * sc
    out = _unpack_windows(packed, w1, win, ch)
    return out.reshape(Tl, N, h1, w1, win * win)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _lookup_cvjp(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret)


def _vjp_fwd(vol, coords, radius, interpret):
    return _fwd_impl(vol, coords, radius, interpret), (vol, coords)


def _vjp_bwd(radius, interpret, residuals, g):
    vol, coords = residuals
    return _bwd_impl(vol, coords, g, radius, interpret)  # v4 backward


_lookup_cvjp.defvjp(_vjp_fwd, _vjp_bwd)


def lookup_level_slab_v5(vol_slab, coords, radius, interpret=False):
    """Windowed bilinear lookup on a row-slab volume (differentiable);
    drop-in for corr_lookup_v3.lookup_level_slab on levels where
    supports(hp, radius) holds."""
    return _lookup_cvjp(vol_slab, coords, radius, interpret)


def lookup_level_slab_q8_v5(vol_slab_q8, scale, coords, radius,
                            interpret=False):
    """Forward-only int8 variant (see corr_lookup_v3.quantize_slab)."""
    assert vol_slab_q8.dtype == jnp.int8, vol_slab_q8.dtype
    return _fwd_impl(vol_slab_q8, coords, radius, interpret, scale=scale)
